"""SQL-callable sketch aggregates (grouped-agg pandas UDFs).

The north-star API surface: ``SELECT role, btl_hll_distinct(conv_id)
FROM turns GROUP BY role`` — the library's sketches as aggregate
functions usable directly from ``spark.sql`` / ``DataFrame.agg``,
complementing the scalar probe functions in ``functions.probe.
register_sql``.

SCALE HONESTY — read before using at 100 TB: Spark executes a
grouped-agg pandas UDF by shuffling the RAW ROWS of each group to one
task (there is no partial-aggregation contract for Python UDAFs in
Spark's aggregation planner).  That is the right trade for
interactive SQL over moderate groups, and the wrong one for a
10^12-row corpus-wide rollup.  The scale path for big builds remains
``plans.agg.build_sketch`` / ``sketch_by_key``, which sketch
per-partition Arrow batches map-side and shuffle only fixed-size
blobs.  These functions exist so that ad-hoc SQL — dashboards,
notebooks, data validation — can reach the same estimators without
leaving SQL; same kernels, same estimates, same error bounds.

Determinism: every registered aggregate is order-independent (the
Sketch protocol law — HLL max-registers, theta min-k set union, KLL
with a pinned seed, t-digest after its deterministic compaction), so
results are stable under partition layout and retries, and equal to
a ``build_sketch`` over the same rows with the same params.

Quantile functions take the quantile as a second (constant) argument:
``btl_kll_quantile(price, 0.5)`` — Spark passes it through as a
constant series; the first value is used.

Planner limitation to know about: Spark refuses to mix pandas
grouped-agg UDFs with built-in aggregate functions inside ONE
aggregation (INVALID_PANDAS_UDF_PLACEMENT).  ``SELECT
btl_hll_distinct(u), count(*) ... GROUP BY g`` fails — run the two
aggregations as separate grouped subqueries and join on the keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

#: params pinned at registration so every call site agrees (and
#: matches what a build_sketch comparison would use)
DEFAULTS = dict(hll_p=14, theta_k=4096, kll_k=200, kll_seed=7, td_delta=200.0)


def register_sketch_aggs(
    spark: SparkSession,
    *,
    prefix: str = "btl_",
    hll_p: int = 14,
    theta_k: int = 4096,
    kll_k: int = 200,
    kll_seed: int = 7,
    td_delta: float = 200.0,
) -> list[str]:
    """Register the sketch aggregate functions on ``spark`` and
    return the registered names:

    - ``{prefix}hll_distinct(col) -> double`` — HLL distinct-count
      estimate (rel. error ~1.04/sqrt(2^p)).
    - ``{prefix}theta_distinct(col) -> double`` — theta/KMV distinct
      estimate (exact below k uniques).
    - ``{prefix}kll_quantile(col, q) -> double`` — KLL rank-error
      quantile.
    - ``{prefix}tdigest_quantile(col, q) -> double`` — t-digest
      quantile (tight at the tails).
    """
    from ..operators.hll import HyperLogLog
    from ..operators.kll import KLL
    from ..operators.tdigest import TDigest
    from ..operators.theta import ThetaSketch

    @pandas_udf("double")
    def hll_distinct(v: pd.Series) -> float:
        h = HyperLogLog(hll_p)
        h.update(v.dropna())
        return float(h.estimate())

    @pandas_udf("double")
    def theta_distinct(v: pd.Series) -> float:
        t = ThetaSketch(theta_k)
        t.update(v.dropna())
        return float(t.estimate())

    @pandas_udf("double")
    def kll_quantile(v: pd.Series, q: pd.Series) -> float:
        s = KLL(kll_k, seed=kll_seed)
        s.update(v.dropna())
        return float(s.quantile(float(q.iloc[0])))

    @pandas_udf("double")
    def tdigest_quantile(v: pd.Series, q: pd.Series) -> float:
        s = TDigest(td_delta)
        s.update(v.dropna())
        return float(s.quantile(float(q.iloc[0])))

    fns = {
        f"{prefix}hll_distinct": hll_distinct,
        f"{prefix}theta_distinct": theta_distinct,
        f"{prefix}kll_quantile": kll_quantile,
        f"{prefix}tdigest_quantile": tdigest_quantile,
    }
    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return sorted(fns)
