"""Deterministic large synthetic rule sets (reference rule corpora run
hundreds-to-thousands of rules; quadrantsec/sagan-rules ships ~4k).

Generated rules target two-word phrases over the synth vocabulary
(~0.1-1 % selectivity each) plus a sprinkle of pcre / nocase / threshold
rules — the shape that exercises the multi-pattern union prefilter.
"""

from __future__ import annotations

from .rules import Rule, parse_rules
from .synth import _VOCAB

_CLASSTYPES = [
    "misc-activity",
    "bad-unknown",
    "attempted-recon",
    "policy-violation",
    "suspicious-traffic",
]


def synth_rules_text(n_rules: int = 100, seed: int = 7) -> str:
    import numpy as np

    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n_rules):
        sid = 2_000_000 + i
        # three-word phrases: ~0.03% selectivity each, so a 100-rule set
        # alerts on a few percent of rows (IDS-realistic), not ~100%
        w1, w2, w3 = rng.choice(_VOCAB, 3, replace=False)
        ct = _CLASSTYPES[i % len(_CLASSTYPES)]
        opts = [f'msg:"synth rule {i}"', f'content:"{w1} {w2} {w3}"']
        if i % 7 == 0:
            opts.append("nocase")
        if i % 11 == 0:
            opts.append(f'pcre:"/\\b{w1}\\b/"')
        if i % 13 == 0:
            opts.append("threshold: type limit, track by_host, count 5, seconds 3600")
        opts += [f"classtype:{ct}", f"sid:{sid}", "rev:1"]
        lines.append("alert any any any -> any any (" + "; ".join(opts) + ";)")
    return "\n".join(lines)


def synth_ruleset(n_rules: int = 100, seed: int = 7) -> list[Rule]:
    rules, _ = parse_rules(synth_rules_text(n_rules, seed))
    return rules
