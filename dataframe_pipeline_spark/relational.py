"""Relational helpers for skew, small-set filtering, and per-group
selection — the join-strategy tier of the engine.

These are the patterns a 100 TB pipeline reaches for when the default
shuffle-hash/sort-merge plan degrades:

* :func:`salted_join` — key-skew mitigation: a handful of hot keys
  would otherwise funnel a fact table's worth of rows into single
  reducers; salting spreads each key over ``n_salts`` reducers at the
  cost of replicating the (medium-sized, non-broadcastable) dim side
  ``n_salts``×.
* :func:`filter_blocklist` — anti-join against a (usually small)
  blocked-key set, broadcast when Catalyst statistics prove it small.
* :func:`topk_per_group` — bounded per-group selection with a
  deterministic total order.
* :func:`range_join` — keyless point-in-interval join via the binning
  trick (equi-join on bucket id, never BroadcastNestedLoopJoin).

The size-gated broadcast hint (:func:`maybe_broadcast`) lives here as
the canonical implementation; query shapes and operators import it
rather than hard-coding ``F.broadcast`` (an unconditional hint on a
fact-derived frame is the classic 100 TB executor OOM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Size gate for explicit dim-broadcast hints — the query-shape analog
#: of label_encoder's BROADCAST_MAX_ROWS gate.  A dim under this bound
#: is safely an executor-memory broadcast; above it the hint is
#: withheld and AQE picks the strategy from the true runtime size (it
#: will still broadcast when the materialized dim turns out small).
#: 256 MB of *source-scan parquet* over-bounds the narrow pre-joined
#: dim by the column-pruning factor, so the gate errs conservative in
#: the OOM-safe direction.
DIM_BROADCAST_MAX_BYTES = 256 << 20


def stats_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame (file-size-based for scans).
    Pure planning metadata — launches no job, reads no data."""
    return int(str(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def maybe_broadcast(df: DataFrame, bound_df: DataFrame | None = None,
                    max_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint: hint only when Catalyst statistics
    bound ``bound_df`` (default: ``df`` itself) under ``max_bytes``;
    otherwise return the frame unhinted and let AQE choose.

    Pass ``bound_df`` when ``df`` is a join whose estimated size
    Catalyst over-states (join estimates multiply child sizes) but
    whose true cardinality is bounded by one input — FK-join dims:
    orders ⋈ customer ⋈ nation has at most one row per orders row, so
    the accurate orders *scan* statistic is the sound bound.  A fact
    table at 100× data blows past the gate and the hint disappears —
    an unconditional ``F.broadcast`` there is the 100 TB executor OOM.
    """
    limit = DIM_BROADCAST_MAX_BYTES if max_bytes is None else max_bytes
    src = df if bound_df is None else bound_df
    return F.broadcast(df) if stats_bytes(src) <= limit else df


#: Size gate for shuffle-hash join hints: the hinted BUILD side must be
#: bounded under this many bytes of source-scan statistics.  The build
#: hash map is per-shuffle-partition (bytes / shuffle.partitions), so
#: 2 GB over 32 local partitions is ~64 MB per task — and on a real
#: cluster with O(1000) shuffle partitions, proportionally smaller.
#: Past the gate the hint is withheld: sort-merge join is the unbounded
#: -input-safe strategy, and AQE keeps the right to broadcast.
SHJ_BUILD_MAX_BYTES = 2 << 30


def maybe_shuffle_hash(df: DataFrame, bound_df: DataFrame | None = None,
                       max_bytes: int | None = None) -> DataFrame:
    """Size-gated ``shuffle_hash`` join hint — the mid-size sibling of
    :func:`maybe_broadcast`.  For a join where one side is too big to
    broadcast (driver build + executor replication cost) but small
    enough that per-partition hash maps beat sort-merge's two sorts,
    hint ``SHUFFLE_HASH`` on that side; otherwise return it unhinted
    (AQE then picks broadcast or SMJ from runtime sizes).

    Like ``maybe_broadcast``, pass ``bound_df`` when the frame is a
    derived plan whose Catalyst size estimate over-states (pre-
    aggregates, FK-join dims): e.g. a lineitem-per-orderkey
    pre-aggregate has at most one row per orders row, so the orders
    SCAN statistic is the sound bound.  A fact side at 100× data blows
    past the gate and the plan degrades gracefully to sort-merge."""
    limit = SHJ_BUILD_MAX_BYTES if max_bytes is None else max_bytes
    src = df if bound_df is None else bound_df
    return df.hint("shuffle_hash") if stats_bytes(src) <= limit else df


def salted_join(fact: DataFrame, dim: DataFrame, on: str | list[str],
                how: str = "inner", n_salts: int = 16,
                salt_src: str | list[str] | None = None) -> DataFrame:
    """Skew-resistant equi-join: spread each join key over ``n_salts``
    shuffle partitions.

    The target shape: ``fact`` has a heavy-tailed key distribution (a
    few keys own a large fraction of the rows) and ``dim`` is too big
    for the broadcast gate, so the default plan shuffles both sides on
    the key and the hot keys serialize on single reducers.  Salting
    joins on ``(key, __salt)`` instead:

    * fact side — ``__salt = xxhash64(salt_src) % n_salts``, a
      deterministic map-only column (stable across retries and
      partitioning, unlike ``rand()``/``monotonically_increasing_id``).
      ``salt_src`` defaults to every fact column; pass a unique id
      column to hash less.
    * dim side — each row replicated once per salt value via an
      ``explode(sequence(...))`` projection (map-only, ``n_salts``×
      row growth on the *small* side only).

    Result is row-identical to the unsalted join for ``how`` in
    ``inner``/``left``/``left_semi``/``left_anti``: every fact row
    carries exactly one salt and the dim side covers all salts.
    Right/full joins would duplicate unmatched dim rows and are
    rejected.

    At 100 TB this trades ``n_salts``× dim replication (bounded,
    chosen) for hot-key reducer parallelism (unbounded win on real
    power-law keys).  AQE's ``skewJoin`` handles *detected* skew by
    splitting oversized partitions at runtime; explicit salting remains
    the deterministic tool when the skew is known a priori or the join
    runs inside a single AQE stage it can't re-plan.

    **Measured crossover** (r10, sf1 lineitem⋈orders where |dim| ≈
    |fact|/4, UNSKEWED keys — the pure-overhead case): salted wall is
    **4.5× plain at n_salts=8, 8.7× at n_salts=32** — the replicated
    dim side (n_salts·|dim| rows) rivals the fact side through the
    shuffle once n_salts ≳ |fact|/|dim|, so "replication on the small
    side only" stops being small.  Rule of thumb: with W reducer slots
    and overhead factor V(n_salts) from above, the unsalted plan's
    hot reducer carries ``max(1/W, hot_share)`` of the work, so
    salting wins only when the hottest key owns ≳ ``V/W`` of the fact
    rows (~14% at W=32, n_salts=8) — keep ``n_salts`` at the smallest
    value that caps the hot reducer, never "more is safer".
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: "
            "replicating the dim side would duplicate unmatched dim rows")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    src = ([salt_src] if isinstance(salt_src, str) else salt_src) or \
        fact.columns
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in src]),
                         F.lit(n_salts)).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    cond = [f[k] == d[k] for k in keys] + [f["__salt"] == d["__salt"]]
    out = f.join(d, cond, how)
    if how.replace("_", "") in ("leftsemi", "leftanti"):
        return out.drop("__salt")          # fact columns only
    out = out.drop(f["__salt"]).drop(d["__salt"])
    for k in keys:
        out = out.drop(d[k])
    return out


#: Measured salting overhead factor on UNSKEWED keys (r10 A/B, sf1
#: lineitem⋈orders, n_salts=8): the salted wall is ~4.5× the plain
#: join's.  The crossover rule documented at :func:`salted_join`: with
#: W reducer slots, the unsalted plan's hot reducer carries
#: ``max(1/W, hot_share)`` of the work, so salting pays only when the
#: hottest key owns more than ``V/W`` of the fact rows.
SALT_OVERHEAD_FACTOR = 4.5

#: Above this Catalyst scan-size estimate the gate probe samples the
#: fact at :data:`PROBE_SAMPLE_FRACTION` instead of aggregating every
#: key occurrence (VERDICT r11 #2).  The gate compares hot_share
#: against ~14%, so percent-level accuracy suffices — a 1e-3 seeded
#: sample of ≥6M rows estimates a 14% share within ±0.5% (binomial
#: CI), while the full probe's two-level aggregate over millions of
#: distinct keys was the dominant cost of the gated join (measured
#: sf1: full probe query 6.8× DuckDB → sampled 3 jobs but the grouped
#:  count runs on ~6k rows).  32 MB ≈ 1–2M fact rows of parquet.
PROBE_SAMPLE_BYTES = 32 << 20

#: Seeded default probe fraction past :data:`PROBE_SAMPLE_BYTES`.
PROBE_SAMPLE_FRACTION = 1e-3

#: Catalyst's "no statistics" sentinel (``spark.sql.defaultSizeInBytes``
#: = Long.MaxValue) — in-memory/RDD-backed relations report this, and it
#: must read as UNKNOWN, not huge: auto-sampling a small in-memory fact
#: at 1e-3 yields a 0–1-row probe whose hot_share is pure noise.
_STATS_UNKNOWN = (1 << 63) - 1

#: A sampled probe that lands under this many rows is too noisy to
#: estimate a ~14% share; the gate re-probes exactly (only small facts
#: land here, where the exact probe is cheap anyway).
PROBE_MIN_SAMPLED_ROWS = 1000


#: Measured hot-key shares keyed by DATA IDENTITY — (file, mtime, size)
#: of every input file plus the probe's key list/null handling/rate.
#: "A production pipeline probes once per table, not once per join"
#: was already this API's documented contract; the cache makes it so:
#: repeated gated joins over the same (unchanged) fact skip the probe
#: job entirely, and a rewritten file misses the cache because its
#: stat identity changed (same invalidation rule as the footer-row
#: cache in ext_queries).
_HOT_SHARE_CACHE: dict = {}


def _probe_cache_key(fact: DataFrame, keys: list, drop_nulls: bool,
                     frac: float | None):
    """Data-addressed cache key for the gate probe, or None when the
    fact's lineage can't be reduced to a plain file listing (derived
    plans — filters/joins change the key distribution, so only a
    single-relation scan/projection is safely cacheable).  The key
    carries the optimized plan string with Catalyst's per-analysis
    expression ids stripped, so a projection that COMPUTES a join key
    can never alias a differently-derived column of the same name,
    while the same query re-planned in a fresh call still hits."""
    import os as _os
    import re as _re

    try:
        plan = fact._jdf.queryExecution().optimizedPlan().toString()
        if plan.count("Relation") != 1 or any(
                w in plan for w in ("Join", "Filter", "Aggregate",
                                    "Union", "Sample", "Generate")):
            return None
        files = fact.inputFiles()
        if not files:
            return None
        ident = []
        for f in files:
            p = f
            if f.startswith("file://"):
                p = f[7:]
            elif f.startswith("file:"):
                p = f[5:]
            st = _os.stat(p)
            ident.append((p, st.st_mtime_ns, st.st_size))
        norm_plan = _re.sub(r"#\d+L?", "", plan)
        return (tuple(sorted(ident)), norm_plan, tuple(keys),
                drop_nulls, frac)
    except Exception:
        return None


def _probe_fraction(fact: DataFrame,
                    sample_fraction: float | None) -> float | None:
    """Effective probe fraction for :func:`maybe_salted_join`'s gate:
    the caller's explicit value wins (1.0 forces the exact probe);
    otherwise sample at :data:`PROBE_SAMPLE_FRACTION` once the fact's
    Catalyst scan estimate exceeds :data:`PROBE_SAMPLE_BYTES` AND is a
    real statistic (the no-stats sentinel probes exactly — fail-safe)."""
    if sample_fraction is not None:
        return sample_fraction
    size = stats_bytes(fact)
    if size != _STATS_UNKNOWN and size > PROBE_SAMPLE_BYTES:
        return PROBE_SAMPLE_FRACTION
    return None


def maybe_salted_join(fact: DataFrame, dim: DataFrame,
                      on: str | list[str], how: str = "inner",
                      n_salts: int = 8,
                      salt_src: str | list[str] | None = None,
                      hot_share_threshold: float | None = None,
                      sample_fraction: float | None = None) -> DataFrame:
    """Statistics-gated :func:`salted_join` (VERDICT r10 #2): measure
    the fact side's hot-key share with ONE partial-aggregated count and
    salt only past the measured ``V/W`` crossover — otherwise fall
    through to the plain equi-join, so a caller on unskewed keys never
    pays the 4.5–8.7× replication overhead the r10 A/B documented.

    **Eager**: unlike most of the API, this call runs the probe job at
    call time (statistics gating needs the number before it can choose
    a plan) — budget one extra job, not a lazy transform.

    Gate: salt iff ``hot_share > SALT_OVERHEAD_FACTOR / W`` with W =
    ``defaultParallelism`` (the reducer slots the hot key would
    serialize on) — ~14% at W=32.  Override with
    ``hot_share_threshold`` when the cluster's slot count isn't the
    right W (e.g. dynamic allocation).

    Probe cost: one column-pruned scan of the join key(s) + a two-level
    count (partial-aggregatable, heap-free — max/sum over the grouped
    counts).  When the fact's Catalyst scan estimate exceeds
    :data:`PROBE_SAMPLE_BYTES` the probe runs on a seeded
    :data:`PROBE_SAMPLE_FRACTION` sample by default (VERDICT r11 #2):
    the gate needs ~percent-level share accuracy only, and the full
    grouped count over millions of distinct keys costs more than the
    join it gates.  Pass ``sample_fraction`` to force a rate (or
    ``1.0`` to force the exact probe); the fixed seed keeps the plan
    choice deterministic across retries.  NULL join keys are dropped
    from the probe for inner/semi joins (ADVICE r11) — an inner join
    prunes them, so a null-heavy fact must not trigger pointless
    salting; for left/anti they still shuffle as fact rows and are
    counted.  Measured shares are CACHED by data identity — the
    (path, mtime, size) set of the fact's input files plus the
    normalized plan/keys — for plain scan/projection facts, so
    repeated gated joins over an unchanged table skip the probe job
    ("probe once per table"); derived facts (filters/joins) are never
    cached, and a rewritten file misses by stat identity.  The RESULT
    is row-identical on either path (salting
    never changes join semantics) with a NORMALIZED column order
    (keys, fact non-key, dim non-key — ADVICE r11: the two paths'
    native orders differed, making output schema order depend on
    measured skew), so the gate can only mis-choose a plan, never an
    answer."""
    keys = [on] if isinstance(on, str) else list(on)
    semi_anti = how.replace("_", "") in ("leftsemi", "leftanti")
    probe = fact.select(*keys)
    drop_nulls = how in ("inner",) or how.replace("_", "") == "leftsemi"
    if drop_nulls:
        probe = probe.dropna(subset=keys)
    frac = _probe_fraction(fact, sample_fraction)
    sampled = frac is not None and frac < 1.0
    cache_key = _probe_cache_key(fact, keys, drop_nulls, frac)
    cached = _HOT_SHARE_CACHE.get(cache_key) if cache_key else None
    if cached is not None:
        hot, tot = cached
    else:
        def _probe(p):
            r = (p.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
                 .agg(F.max("__n").alias("__hot"),
                      F.sum("__n").alias("__tot")).head())
            return r["__hot"] or 0, r["__tot"] or 0

        hot, tot = _probe(probe.sample(fraction=frac, seed=42)
                          if sampled else probe)
        if sampled and tot < PROBE_MIN_SAMPLED_ROWS and \
                sample_fraction is None:
            # the auto-sample under-shot (fact smaller than its stats
            # suggested): a <1000-row sample can't resolve a ~14%
            # share, so fall back to the exact probe — cheap here
            hot, tot = _probe(probe)
        if cache_key:
            _HOT_SHARE_CACHE[cache_key] = (hot, tot)
    hot_share = hot / tot if tot else 0.0
    w = max(fact.sparkSession.sparkContext.defaultParallelism, 1)
    threshold = (SALT_OVERHEAD_FACTOR / w if hot_share_threshold is None
                 else hot_share_threshold)
    if hot_share <= threshold:
        out = fact.join(dim, keys, how)
    else:
        out = salted_join(fact, dim, on, how=how, n_salts=n_salts,
                          salt_src=salt_src)
    if semi_anti:
        return out.select(*fact.columns)
    order = keys + [c for c in fact.columns if c not in keys] + \
        [c for c in dim.columns if c not in keys]
    return out.select(*order)


def filter_blocklist(df: DataFrame, blocked: DataFrame, col: str,
                     blocked_col: str | None = None) -> DataFrame:
    """Drop rows whose ``col`` appears in ``blocked`` — URL/domain/user
    blocklisting, the anti-join step of every web-corpus pipeline.

    ``left_anti`` semantics (= SQL ``NOT EXISTS``): rows with NULL keys
    are KEPT (a NULL never equals a blocked value) and NULLs in the
    blocklist never match — unlike ``NOT IN``, which nulls out the
    whole predicate.  The blocklist side takes the size-gated broadcast
    hint: blocklists are usually small (broadcast anti-join = map-only,
    zero shuffle of the corpus), but a blocklist that outgrows the gate
    falls back to a keyed shuffle instead of an executor OOM.
    """
    bcol = blocked_col or col
    b = blocked.select(F.col(bcol).alias("__blocked_key")).distinct()
    return df.join(maybe_broadcast(b),
                   df[col] == F.col("__blocked_key"), "left_anti")


def topk_per_group(df: DataFrame, group_cols: str | list[str],
                   order_col: str, k: int, descending: bool = True,
                   tiebreak: str | list[str] | None = None,
                   rank_col: str = "rk") -> DataFrame:
    """Top-``k`` rows per group under a deterministic total order —
    best-documents-per-domain, top-spenders-per-segment, most-recent-
    per-key selection.

    ``tiebreak`` columns extend the ordering to a total order; without
    one, ties at the k-th place make the kept set partition-dependent,
    so a unique tiebreak is required (pass the row's id column).

    Plan: one hash shuffle on the group key, then a per-group sort +
    ``row_number`` with the filter ``rk <= k`` pushed into Spark's
    rank-limit window path (physical ``WindowGroupLimit``), which keeps
    a bounded k-row heap per group on both the map and reduce side
    instead of fully sorting each group — the window equivalent of
    ``TakeOrderedAndProject``.  Skewed group sizes degrade gracefully:
    the heap is O(k) regardless of group size.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    ties = ([tiebreak] if isinstance(tiebreak, str) else tiebreak) or []
    if not ties:
        raise ValueError("topk_per_group needs a unique tiebreak column "
                         "for a deterministic kept set")
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()
             ] + [F.col(t).asc() for t in ties]
    w = Window.partitionBy(*groups).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str, end_col: str, bin_width: float,
               how: str = "inner") -> DataFrame:
    """Scale-correct point-in-interval join with NO equality key —
    IP→CIDR-range lookup, value→band assignment, timestamp→calendar
    window.  Spark's planner turns a bare inequality join into
    BroadcastNestedLoopJoin (O(points × intervals) compared row pairs);
    this helper restores an equi-join via the standard binning trick:

    * intervals explode to every ``bin_width`` bucket they overlap
      (``sequence(floor(start/w), floor(end/w))`` — map-only, growth
      factor ≈ interval_length / bin_width on the SMALL side);
    * points compute their single bucket;
    * equi-join on the bucket (hash/sort-merge — shuffles, AQE, skew
      handling all apply), then the exact ``start <= p <= end`` filter.

    A point has exactly ONE bucket, so each matching (point, interval)
    pair meets exactly once — no distinct pass.  Choose ``bin_width``
    near the typical interval length: smaller wastes interval
    replication, larger degrades bucket selectivity toward the
    nested-loop it replaces.  Inclusive bounds on both ends.  Numeric
    or timestamp columns (timestamps compare natively; binning uses
    their epoch value).

    ``how``: ``inner`` (matched pairs) or ``left`` (points without any
    interval survive with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, not {how!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")

    def as_num(c):
        return F.col(c).cast("double")

    w = F.lit(float(bin_width))
    p = points.withColumn(
        "__bin", F.floor(as_num(point_col) / w).cast("long"))
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(as_num(start_col) / w).cast("long"),
            F.floor(as_num(end_col) / w).cast("long"))))
    in_range = ((F.col(point_col) >= F.col(start_col))
                & (F.col(point_col) <= F.col(end_col)))
    if how == "inner":
        return (p.join(iv, "__bin").filter(in_range).drop("__bin"))
    # left: match first, then recover unmatched points
    matched = p.join(iv, "__bin").filter(in_range)
    iv_cols = [c for c in intervals.columns if c not in points.columns]
    unmatched = p.join(
        matched.select("__bin", *[F.col(c) for c in points.columns]),
        points.columns, "left_anti")
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.drop("__bin").unionByName(
        unmatched.drop("__bin").select(matched.drop("__bin").columns))


def scd2(changes: DataFrame, key: str | list[str], version_col: str,
         attrs: list[str] | None = None) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one
    validity interval per (key, consecutive distinct attribute state) —
    ``valid_from`` = the change's version, ``valid_to`` = the NEXT
    change's version (NULL while current), ``is_current`` flag.

    Change rows where no tracked attribute actually changed (no-op
    updates, at-least-once replays) are COLLAPSED into the surrounding
    interval via a NULL-safe lag comparison, so the history is minimal
    regardless of upstream chatter.

    Scale shape: ONE hash shuffle on the key; the collapse lag and the
    interval lead share the same (key, version) sort, so the plan is
    Exchange → Sort → three Window passes → filters — no joins, no
    second scan.  Ties on ``version_col`` within a key keep exactly one
    deterministic winner (the last row in attr order) rather than
    emitting zero-length intervals.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if attrs is None:
        attrs = [c for c in changes.columns
                 if c not in keys + [version_col]]
    if not attrs:
        raise ValueError("scd2 needs at least one tracked attribute")
    order = [F.col(version_col).asc(), *[F.col(a).asc_nulls_last()
                                         for a in attrs]]
    w = Window.partitionBy(*keys).orderBy(*order)
    # ties on version_col: the sort puts tied rows adjacent (ordered by
    # the attrs), so the winner — the LAST row of each (key, version)
    # run — is the one whose next row has a different version.  A lead
    # over the same window shares the existing shuffle+sort; without
    # this, two tied rows with different attrs would both survive and
    # emit a zero-length interval (valid_from == valid_to).
    changes = (changes
               .withColumn("__tie_loser",
                           F.lead(version_col).over(w)
                           .eqNullSafe(F.col(version_col)))
               .filter(~F.col("__tie_loser"))
               .drop("__tie_loser"))
    # drop no-op changes: every attr NULL-safe-equal to the previous row
    same_as_prev = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.lag(a).over(w))
        same_as_prev = eq if same_as_prev is None else (same_as_prev & eq)
    # first row per key has lag NULL -> eqNullSafe False unless attr NULL;
    # guard with row_number so the opening state always survives
    deduped = (changes
               .withColumn("__rn", F.row_number().over(w))
               .withColumn("__noop", (F.col("__rn") > 1) & same_as_prev)
               .filter(~F.col("__noop")))
    w2 = (Window.partitionBy(*keys)
          .orderBy(F.col(version_col).asc(),
                   *[F.col(a).asc_nulls_last() for a in attrs]))
    out = (deduped
           .withColumn("valid_from", F.col(version_col))
           .withColumn("valid_to", F.lead(version_col).over(w2))
           .withColumn("is_current", F.col("valid_to").isNull())
           .drop("__rn", "__noop", version_col))
    return out


class IncrementalRollup:
    """Maintain a persisted grouped aggregate under appending batches
    WITHOUT rescanning history — the stored rollup IS the partial
    aggregation state (per group: decimal sums + counts), and folding
    in a batch is a groupBy over (stored-state ∪ batch-partials).

    The lakehouse pattern this models: a 100 TB fact history whose
    per-key rollup must stay fresh as daily batches land.  Recomputing
    scans the full history every day (O(history)); this folds each
    batch in O(batch + |groups|), exactly like Spark's own partial
    aggregation merges map-side states — just persisted between jobs.

    Sums are exact DECIMAL(28,6) so the merged result is bit-identical
    to a full recompute regardless of batch count or merge order
    (float partials would drift with merge order); means are derived
    at read time from (sum, count).
    """

    def __init__(self, group_cols: str | list[str], sums: dict):
        self.group_cols = ([group_cols] if isinstance(group_cols, str)
                           else list(group_cols))
        self.sums = dict(sums)          # output name -> source column

    def _partial(self, df: DataFrame) -> DataFrame:
        aggs = [F.sum(F.col(src).cast("decimal(28,6)")).alias(f"__s_{o}")
                for o, src in self.sums.items()]
        aggs.append(F.count(F.lit(1)).alias("__cnt"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def init(self, df: DataFrame) -> DataFrame:
        """Bootstrap the rollup state from the initial history."""
        return self._partial(df)

    def merge(self, state: DataFrame, batch: DataFrame) -> DataFrame:
        """Fold an appended batch into the rollup state: batch is
        partially aggregated (map-side combine), then merged with the
        stored state by a groupBy over the union — one shuffle keyed
        on the (small) group domain, never over raw history."""
        merged = state.unionByName(self._partial(batch))
        aggs = [F.sum(f"__s_{o}").alias(f"__s_{o}") for o in self.sums]
        aggs.append(F.sum("__cnt").alias("__cnt"))
        return merged.groupBy(*self.group_cols).agg(*aggs)

    def read(self, state: DataFrame, means: bool = True) -> DataFrame:
        """Materialize the user-facing rollup: sums as double, counts,
        and derived means."""
        sel = [*self.group_cols]
        for o in self.sums:
            sel.append(F.col(f"__s_{o}").cast("double").alias(o))
        sel.append(F.col("__cnt").alias("n_rows"))
        if means:
            for o in self.sums:
                sel.append((F.col(f"__s_{o}").cast("double")
                            / F.col("__cnt")).alias(f"{o}_mean"))
        return state.select(*sel)


class BloomFilter:
    """Deterministic k-hash Bloom filter over a key column, built by ONE
    aggregate and applied as literal bit-array arithmetic in the probe
    side's scan stage — the explicit, engine-independent variant of
    Spark's runtime row-level bloom join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``).

    Build: every key contributes ``k_hashes`` bit positions
    (``xxhash64(i ':' key) % bits`` — deterministic across runs; the
    hash need not be engine-portable because the bloom is
    correctness-neutral: the downstream exact join removes its false
    positives, so the oracle is the plain join.  xxhash64 is ~100x
    cheaper per row than the md5-derived h32 the dedup tier uses,
    which matters at 6 hash evaluations per probed fact row);
    positions fold into ``bits/64`` longs with ``bit_or`` in a single
    groupBy, and the driver collects AT MOST ``bits/64`` rows (1 KB for
    8192 bits) — the fit-scalar pattern, never the key set itself.

    Apply: membership is ``k_hashes`` literal-array lookups + shift/AND
    per probe row, inside whole-stage codegen — no join, no shuffle, no
    broadcast exchange.  False positives pass (rate ~(1-e^{-kn/m})^k);
    false negatives never.  Downstream exact joins stay correct and do
    strictly less work.
    """

    def __init__(self, bits: int = 8192, k_hashes: int = 3):
        if bits % 64:
            raise ValueError("bits must be a multiple of 64")
        self.bits = bits
        self.k_hashes = k_hashes
        self.words_: list[int] | None = None

    def _positions(self, col: str) -> list[str]:
        return [
            f"pmod(xxhash64(concat('{i}:', cast({col} as string))), "
            f"{self.bits})"
            for i in range(self.k_hashes)
        ]

    def fit(self, df: DataFrame, col: str) -> "BloomFilter":
        pos = ", ".join(self._positions(col))
        folded = (df.filter(F.col(col).isNotNull())
                  .select(F.explode(F.expr(f"array({pos})")).alias("__p"))
                  .groupBy((F.col("__p") / 64).cast("int").alias("__w"))
                  .agg(F.expr(
                      "bit_or(shiftleft(cast(1 as bigint), "
                      "cast(__p % 64 as int)))").alias("__bits"))
                  .collect())
        words = [0] * (self.bits // 64)
        for r in folded:
            words[r["__w"]] = r["__bits"]
        self.words_ = words
        return self

    def might_contain(self, col: str):
        """Boolean Column: all k bit positions set (literal arithmetic,
        NULL keys -> false like an inner join would drop them)."""
        if self.words_ is None:
            raise ValueError("fit() the bloom filter first")
        arr = "array(" + ", ".join(f"{w}L" for w in self.words_) + ")"
        cond = F.col(col).isNotNull()
        for p in self._positions(col):
            word = f"element_at({arr}, cast({p} div 64 as int) + 1)"
            cond = cond & F.expr(
                f"(shiftright({word}, cast({p} % 64 as int)) & 1) = 1")
        return cond


def bloom_prune_join(fact: DataFrame, dim: DataFrame, on: str,
                     bits: int = 8192, k_hashes: int = 3,
                     how: str = "inner") -> DataFrame:
    """Equi-join with a Bloom pre-filter on the fact side: fit a bloom
    over the dim's join keys, drop fact rows that cannot match BEFORE
    the shuffle, then run the exact join (which removes the bloom's
    false positives — the result is row-identical to the plain join,
    so the oracle is the plain SQL join).

    At 100 TB this is the difference between shuffling the full fact
    table and shuffling only the ~selectivity fraction that can match a
    filtered dim; the bloom rides in the scan stage's codegen, so the
    pruned rows never leave the mapper."""
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom pruning is sound for inner/semi joins "
                         "only (outer joins need the unpruned side)")
    bf = BloomFilter(bits=bits, k_hashes=k_hashes).fit(dim, on)
    pruned = fact.filter(bf.might_contain(on))
    return pruned.join(dim, on, how)
