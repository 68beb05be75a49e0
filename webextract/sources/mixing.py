"""Dataset mixing: union-with-ratio-sampling across sources.

The reference mixes multiple label files with per-file sampling ratios
(``SimpleDataSet.get_image_info_list`` — ``data_lines.extend(random
sample of each file)``, ppocr/data/simple_dataset.py:56-68, ratio draw
at :61 via ``random.random() < ratio``). At 10^12 scale RNG sampling
is wrong twice over: not reproducible across retries, and not stable
under repartitioning. The scale-correct version samples by CONTENT
HASH — a document is in or out of the sample forever, on any cluster,
in any partition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key: str, ratio: float, salt: str = "") -> DataFrame:
    """Deterministic ratio-sample: keep rows whose md5(salt || key)
    first-8-hex integer falls under ratio · 2^32. Engine-portable
    (md5 + hex math only), stable under repartition/retry."""
    return df.filter(sample_expr(key, ratio, salt))


def union_sampled(
    sources: list[tuple[DataFrame, float]], key: str, salt: str = ""
) -> DataFrame:
    """Union heterogeneous sources, each down-sampled to its ratio —
    the multi-label-file mix (simple_dataset.py:56-68) as one
    DataFrame. ``unionByName`` with missing columns allowed, so
    sources may carry extra metadata columns."""
    parts = [
        hash_sample(df, key, ratio, salt=f"{salt}{i}:")
        for i, (df, ratio) in enumerate(sources)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def sample_expr(key: str, ratio: float, salt: str = "") -> Column:
    """The predicate itself, for use in filters/joins."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h < int(ratio * (1 << 32))
