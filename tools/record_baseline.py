"""Record bench + scaling results into BENCH/BASELINE.md.

Usage:
  python tools/record_baseline.py            # runs bench.py + --scaling
  python tools/record_baseline.py --from-json bench.json scaling.json
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), *args],
        capture_output=True,
        text=True,
        check=True,
        env=dict(os.environ),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if "--from-json" in sys.argv:
        i = sys.argv.index("--from-json")
        with open(sys.argv[i + 1]) as f:
            bench = json.load(f)
        with open(sys.argv[i + 2]) as f:
            scaling = json.load(f)
    else:
        bench = run([])
        scaling = run(["--scaling"])

    stamp = datetime.date.today().isoformat()
    lines = [
        f"## Measured {stamp}",
        "",
        f"- input: {bench['rows']:,} synthetic webpages rows (seed=42, {bench['sf']})",
        f"- headline ({bench['num_cpus']} cpus): {bench['value']} s"
        f" = {bench['rows_per_sec']:,.0f} rows/s, {bench['alerts_routed']:,} alerts routed",
        f"- scaling: {scaling['sec_8']} s @8 cpus ({scaling['rows_per_sec_8']:,.0f} rows/s)"
        f" vs {scaling['sec_32']} s @32 cpus ({scaling['rows_per_sec_32']:,.0f} rows/s)",
        f"- **scaling efficiency: {scaling['scaling_efficiency']}**"
        f" (target ≥ 0.8; = (thr32/thr8)/(32/8), fresh processes, same input)",
        "",
        "Per-query seconds (single run, " + str(bench["num_cpus"]) + " cpus):",
        "",
        "```json",
        json.dumps(bench["queries"], indent=2),
        "```",
        "",
    ]
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    header = "# BENCH results (written by tools/record_baseline.py)\n\n"
    prev = ""
    if os.path.exists(path):
        prev = open(path).read().replace(header, "")
    with open(path, "w") as f:
        f.write(header + "\n".join(lines) + "\n" + prev)
    print(json.dumps({"bench": bench, "scaling": scaling}))


if __name__ == "__main__":
    main()
