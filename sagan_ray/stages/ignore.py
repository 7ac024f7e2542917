"""Global ignore list — cheap negative prefilter before the engine.

Reference: ``src/ignore.c`` (1.x ``sagan-ignore.c``): any line containing
one of N configured strings is discarded BEFORE rule evaluation. Here a
single vectorized ``map_batches`` filter with Arrow ``match_substring``
any-of; first stage in the pipeline so ignored rows never reach the
matcher or a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def make_ignore_filter(patterns: list[str], text_col: str = "text",
                       nocase: bool = True):
    def drop_ignored(batch: pa.Table) -> pa.Table:
        if not patterns or batch.num_rows == 0:
            return batch
        hit = np.zeros(batch.num_rows, dtype=bool)
        for p in patterns:
            m = pc.match_substring(batch[text_col], p, ignore_case=nocase)
            hit |= np.asarray(m.combine_chunks().fill_null(False), dtype=bool)
        return batch.filter(pa.array(~hit))

    return drop_ignored


def ignore_stage(ds, patterns: list[str], text_col: str = "text"):
    return ds.map_batches(make_ignore_filter(patterns, text_col),
                          batch_format="pyarrow")
