"""Physical-plan assertions for the extended TPC-H tier (tpch.py):
the shapes that would break at 100 TB if they silently regressed —
pushdown reaching the scan, EXISTS as a semi join (not a correlated
re-scan), equi-joins never degrading to nested loops, fact aggregates
running before dim joins, and top-k as bounded heaps."""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


def test_q6_filters_reach_scan_and_columns_pruned(spark, qs):
    p = _plan(qs["tpch_q6_revenue"](spark, SF))
    assert "PushedFilters: [" in p and "IsNotNull(l_shipdate)" in p
    # only the 4 needed columns in ReadSchema, not all 11
    rs = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_extendedprice" in rs and "l_returnflag" not in rs


def test_q4_under_gate_broadcasts_orders_no_fact_shuffle(spark, qs):
    """r12 shape: when the quarter-pruned orders side fits the gate it
    broadcasts into an inner join — the lineitem scan feeds the join
    with NO exchange below it — and the per-order collapse is a hash
    aggregate keyed on o_orderkey (EXISTS-equivalent), never a sort."""
    p = _plan(qs["tpch_q4_priority"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "NestedLoop" not in p
    assert "Sort" not in p
    # the only hash exchanges are the two aggregate regroupings —
    # neither side of the join itself is shuffled
    assert p.count("Exchange hashpartitioning") <= 2
    agg_keys = [ln for ln in p.splitlines()
                if "HashAggregate" in ln and "o_orderkey" in ln]
    assert agg_keys  # per-order collapse is an aggregate, pre-regroup


def test_q4_past_gate_falls_back_to_semi_join(spark, qs, monkeypatch):
    """Past the broadcast gate (100 TB orders) the EXISTS must keep the
    strictly-smaller-shuffle left-semi shape."""
    from dataframe_pipeline_spark import tpch

    monkeypatch.setattr(tpch, "DIM_BROADCAST_MAX_BYTES", 0)
    p = _plan(qs["tpch_q4_priority"](spark, SF))
    assert "LeftSemi" in p
    assert "NestedLoop" not in p


def test_q13_aggregates_orders_below_outer_join(spark, qs):
    """r12 shape: the per-customer count is a (o_custkey) aggregate on
    the ORDER side, below the outer join — the join's build input is
    the pre-aggregate, not the order rows, and the customer side is
    never exchanged."""
    p = _plan(qs["tpch_q13_custdist"](spark, SF))
    assert "BroadcastHashJoin" in p and "LeftOuter" in p
    # order rows aggregate BEFORE the join: the broadcast subtree
    # contains a HashAggregate keyed on o_custkey
    bcast = p.split("BroadcastExchange", 1)[1]
    assert "HashAggregate" in bcast and "o_custkey" in bcast
    # fact exchange carries pre-aggregated rows; join adds none
    assert p.count("Exchange hashpartitioning") <= 2


def test_q19_disjunction_stays_hash_join(spark, qs):
    """OR-of-ANDs predicates must not push the join into a nested loop:
    the partkey equi-condition keys a hash join, the disjunction is a
    post-join filter."""
    p = _plan(qs["tpch_q19_disjunct"](spark, SF))
    assert "NestedLoop" not in p


def test_q10_aggregates_fact_before_dim_join(spark, qs):
    """The per-customer revenue aggregate must run below the customer/
    nation joins — grouping after the join would shuffle dim payload
    columns through the fact exchange."""
    df = qs["tpch_q10_returns"](spark, SF)
    p = _plan(df)
    # TakeOrderedAndProject = heap top-k, never a global sort
    assert "TakeOrderedAndProject" in p
    # the aggregate's grouping key is o_custkey only (pre-join agg);
    # a post-join aggregate would key on c_custkey/c_name etc.
    agg_lines = [ln for ln in p.splitlines() if "HashAggregate" in ln]
    assert agg_lines and all("c_name" not in ln for ln in agg_lines)


def test_q21_is_two_aggregates_not_correlated_rescan(spark, qs):
    """The EXISTS/NOT-EXISTS pair must compile to hash aggregates plus
    one self-join on the order key — a correlated formulation would
    plan per-row subquery re-scans (visible as extra scans/joins)."""
    p = _plan(qs["tpch_q21_waiting"](spark, SF))
    assert p.count("Scan parquet") <= 3  # lineitem, orders, supplier
    assert "NestedLoop" not in p


def test_q21_single_fact_exchange_no_window(spark, qs):
    """r11 shuffle-minimal shape, pinned: ONE fact-grain exchange (the
    explicit repartition on l_orderkey) feeds BOTH the pair- and
    order-grain aggregates exchange-free — the only other exchange is
    the tiny per-supplier regroup — and the per-order counts are hash
    aggregates, never a sort-based WindowExec."""
    p = _plan(qs["tpch_q21_waiting"](spark, SF))
    assert "Window" not in p
    assert p.count("REPARTITION_BY_COL") == 1
    # repartition + late_supp regroup; broadcasts don't hash-partition
    assert p.count("Exchange hashpartitioning") <= 2


def test_q15_max_is_broadcast_scalar(spark, qs):
    """The revenue max joins back as a 1-row broadcast — never a
    shuffle of the per-supplier aggregate against itself."""
    p = _plan(qs["tpch_q15_top_supplier"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_q22_anti_join_and_scalar_broadcast(spark, qs):
    p = _plan(qs["tpch_q22_idle"](spark, SF))
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_q17_inner_average_is_single_scan_window(spark, qs):
    """r13 shape: the correlated per-part average is a window aggregate
    on a SINGLE scan of the brand-pruned lineitem — no aggregate-side
    rescan, no join-back, no nested loop.  Exactly one lineitem scan and
    one part scan (2 total)."""
    p = _plan(qs["tpch_q17_small_qty"](spark, SF))
    assert p.count("Scan parquet") <= 2
    assert "Window" in p
    assert "NestedLoop" not in p


def test_q12_fact_join_is_hash_not_sort_merge(spark, qs):
    """r13 shape: the lineitem-orders fact join is a shuffled-hash (or
    broadcast) join under the gate — never sort-merge, whose two ~|fact|
    sorts are pure overhead next to per-partition hash builds."""
    p = _plan(qs["tpch_q12_priority_class"](spark, SF))
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_q18_survivor_join_is_hash_not_sort_merge(spark, qs):
    """r13 shape: the HAVING-filtered pre-aggregate joins orders via a
    shuffled-hash build (AQE can't see post-filter selectivity in the
    pre-HAVING exchange bytes, so it kept SMJ); no join-side sorts."""
    p = _plan(qs["tpch_q18_large_orders"](spark, SF))
    assert "SortMergeJoin" not in p


def test_q20_supplier_join_is_broadcast_inner(spark, qs):
    """r13 shape: the qualifying-keys semi join runs as an inner join
    (excess is key-unique) with the supplier dim broadcast — no
    supplier exchange, no sort-merge."""
    p = _plan(qs["tpch_q20_excess"](spark, SF))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_q2_min_cost_no_correlated_rescan(spark, qs):
    """Q2's correlated min subquery must be one grouped aggregate joined
    back — no nested loop, and the semi-join pruning keeps the pair
    aggregate below the dim joins."""
    p = _plan(qs["tpch_q2_mincost"](spark, SF))
    assert "NestedLoop" not in p
    assert "LeftSemi" in p
    assert "TakeOrderedAndProject" in p


def test_q11_total_is_reaggregated_not_rescanned(spark, qs):
    """The Q11 global total must derive from the grouped result (a
    second tiny aggregate over the checkpoint), not a second lineitem
    scan — AQE does NOT reuse the per-part exchange on its own."""
    p = _plan(qs["tpch_q11_value"](spark, SF))
    assert p.count("FileScan parquet") == 0  # both consumers read the
    assert p.count("Scan ExistingRDD") >= 1  # checkpointed grouped rows


def test_q12_single_pass_conditional_counts(spark, qs):
    """Both priority-class counts must come out of ONE grouped aggregate
    over one join — no per-class scan."""
    p = _plan(qs["tpch_q12_priority_class"](spark, SF))
    assert p.count("FileScan parquet") == 2  # lineitem + orders, once each
    assert "PushedFilters: [" in p and "l_shipdate" in p


def test_q16_not_in_is_anti_join(spark, qs):
    p = _plan(qs["tpch_q16_variety"](spark, SF))
    assert "LeftAnti" in p
    assert "NestedLoop" not in p


def test_q20_one_pass_conditional_sums(spark, qs):
    """Q20's windowed and all-years quantity sums must share one grouped
    aggregate over one semi-pruned fact scan."""
    p = _plan(qs["tpch_q20_excess"](spark, SF))
    assert p.count("FileScan parquet") <= 4
    assert "LeftSemi" in p
    assert "NestedLoop" not in p
