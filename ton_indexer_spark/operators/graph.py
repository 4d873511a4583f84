"""Distributed connected components — batch trace assembly v0
(SURVEY.md §2.8 T2 / §7 step 4).

The reference assembles traces single-threaded and in-order
(TraceAssembler.cpp:285-412): each transaction joins the open trace that
produced its in-message, else roots a new trace.  Because a trace IS the
connected component of transactions linked by message hashes, the batch
equivalent is CC over the (tx, msg_hash) bipartite edge list.

Algorithm: large-star / small-star style alternating label propagation
("Connected Components in MapReduce and Beyond", Kiveris et al., SOCC'14,
simplified to hash-min propagation): every node starts labeled with its own
id; each round propagates min(label) across edges; converges in
O(log(diameter)) rounds.  Trace graphs are shallow (FIXTURES.md §2: depth
2-5 typical, <= 4000 nodes max), so 3-6 rounds suffice; each round is one
shuffle on node id.  Checkpointing every few rounds truncates the lineage so
plans don't blow up at 100 TB.

The DuckDB oracle for this operator is a recursive CTE doing the same
min-label propagation, so correctness is gate-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _local_forest_roots(edges: DataFrame) -> DataFrame:
    """Single-task root resolution for small edge sets.

    All edges collapse into ONE Arrow task that walks the parent chains
    in-memory with memoized path compression — O(n) total, no iterative
    shuffles.  At block cadence a micro-batch carries 10²–10⁴ edges, where
    the distributed loop's per-round fixed cost (job scheduling + state
    checkpoint + convergence probe) dominates wall time by 10×; the
    reference resolves exactly this regime single-threaded in-memory
    (TraceAssembler.cpp:285-412).  Only reachable under the
    ``local_threshold`` size gate in forest_roots.
    """
    out_schema = T.StructType([
        T.StructField("node", edges.schema["node"].dataType),
        T.StructField("root", edges.schema["anc"].dataType),
    ])

    def resolve(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        df = pd.concat(chunks, ignore_index=True)
        # duplicate children keep the minimum parent — same determinism
        # contract as the distributed path's F.min aggregation
        df = df.sort_values(["node", "anc"]).drop_duplicates(
            "node", keep="first")
        # break 2-cycles exactly like the distributed pre-pass: drop the
        # node<anc side of a mutual pair, so the larger id points at the
        # smaller and the smaller becomes the root on BOTH paths
        pairs = set(zip(df["node"], df["anc"]))
        keep = [
            not ((a, n) in pairs and n < a)
            for n, a in zip(df["node"], df["anc"])
        ]
        df = df[keep]
        parents = dict(zip(df["node"], df["anc"]))
        memo: dict = {}
        for start in parents:
            if start in memo:
                continue
            path = []
            seen = set()
            x = start
            while x in parents and x not in memo:
                if x in seen:  # corrupted (cyclic) input: deterministic
                    break      # root = current position, mirrors max_iter
                seen.add(x)
                path.append(x)
                x = parents[x]
            root = memo.get(x, x)
            for p in path:
                memo[p] = root
        yield pd.DataFrame(
            {"node": list(memo.keys()), "root": list(memo.values())}
        )

    return edges.repartition(1).mapInPandas(resolve, out_schema)


def forest_roots(
    child_parent: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_iter: int = 16,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Root of each node in a FOREST (every node has at most one parent),
    via pointer doubling: anc ← anc(anc), converging in O(log depth) rounds
    with ONE self-join per round.

    This is the fast path for trace assembly: a TON transaction consumes
    exactly one in-message, so the producer→consumer graph is a forest and
    generic connected components (3 joins/round) is unnecessary.  If the
    input violates the forest property (duplicate msg_hash), the minimum
    parent is kept — deterministic, and flagged upstream as data corruption.

    Inputs at or below ``local_threshold`` edges resolve in a single Arrow
    task (_local_forest_roots) — the micro-batch regime, where per-round
    job overhead dominates; above it, distributed pointer doubling — the
    backfill/100 TB regime, where data volume dominates.  Pass
    ``local_threshold=0`` to force the distributed path.

    Returns (node, root) for every node appearing as a child; roots
    themselves are not emitted (they have no parent row).
    """
    edges = child_parent.select(
        F.col(child).alias("node"), F.col(parent).alias("anc")
    )
    # callers checkpoint the edge list, so this count is a cheap scan; the
    # size gate picks the regime-appropriate physical strategy (the same
    # decision AQE makes for join sides, applied to an iterative operator)
    if local_threshold > 0 and edges.count() <= local_threshold:
        return _local_forest_roots(edges)

    # materialize the grouped parents FIRST: the cycle-break pre-pass
    # below self-joins this frame twice, and an un-checkpointed anc would
    # re-run the caller's upstream once per join side
    anc = (
        edges.groupBy("node")
        .agg(F.min("anc").alias("anc"))
        .localCheckpoint(eager=True)
    )
    # corrupted input (duplicate msg_hash) can leave a MUTUAL pair a↔b
    # that min-parent dedup cannot remove; break it deterministically —
    # drop the node<anc side so the smaller id becomes the root — the
    # identical rule _local_forest_roots applies, keeping the pinned
    # "local ≡ distributed" parity contract on the corrupt-input edge
    # case too (≥3-cycles need lt-ordering violations beyond duplicate
    # hashes and stay out of contract)
    rev = anc.select(F.col("anc").alias("node"), F.col("node").alias("anc"))
    mutual_lo = (
        anc.join(rev, ["node", "anc"], "left_semi")
        .filter(F.col("node") < F.col("anc"))
    )
    anc = (
        anc.join(mutual_lo, ["node", "anc"], "left_anti")
        # second materialization before the loop (cheap: both inputs are
        # the checkpointed frame); round 1 joins anc with itself
        .localCheckpoint(eager=True)
    )

    def _jump(cur: DataFrame) -> DataFrame:
        """One pointer jump; `moved` accumulates across jumps in a round."""
        carried = "moved" in cur.columns
        out = (
            cur.alias("a")
            .join(
                cur.select(
                    F.col("node").alias("anc"), F.col("anc").alias("anc2")
                ).alias("b"),
                "anc",
                "left",
            )
        )
        # "moved" must mean the pointer actually CHANGED: on a (residual)
        # cycle anc2 is always non-null even at the fixpoint, and the
        # weaker isNotNull flag would spin the loop to max_iter
        moved = F.col("anc2").isNotNull() & (
            F.col("anc2") != F.col("a.anc")
        )
        if carried:
            moved = moved | F.col("a.moved")
        return out.select(
            F.col("node"),
            F.coalesce(F.col("anc2"), F.col("a.anc")).alias("anc"),
            moved.alias("moved"),
        )

    for _ in range(max_iter):
        # two pointer jumps per materialization round (anc ← anc⁴): trace
        # forests are shallow (fully resolved by round 2 for depth ≤ 16),
        # and at block cadence the per-round job overhead — not data
        # volume — is the cost, so halving the checkpointed rounds
        # halves the wall
        jumped = _jump(_jump(anc))
        jumped = jumped.localCheckpoint(eager=True)
        any_moved = jumped.filter(F.col("moved")).limit(1).count()
        anc = jumped.drop("moved")
        if any_moved == 0:
            break
    return anc.withColumnRenamed("anc", "root")


def _local_connected_components(sym: DataFrame) -> DataFrame:
    """Single-task min-label union-find for small edge sets — the CC analog
    of _local_forest_roots.  Size-gated in connected_components; the
    distributed loop remains the >threshold path and is pinned equivalent
    by tests."""
    out_schema = T.StructType([
        T.StructField("node", sym.schema["a"].dataType),
        T.StructField("component", sym.schema["a"].dataType),
    ])

    def resolve(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        df = pd.concat(chunks, ignore_index=True)
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(df["a"], df["b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by label order so the final root IS the min id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = pd.unique(df["a"])
        yield pd.DataFrame(
            {"node": nodes, "component": [find(n) for n in nodes]}
        )

    return sym.repartition(1).mapInPandas(resolve, out_schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    jumps_per_round: int = 2,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Label each node with min(node id) of its component.

    edges — DataFrame with two node-id columns (any orderable type).
    Returns (node, component).

    ``jumps_per_round`` — pointer-jump applications after each hash-min
    propagation.  Each jump is a cheap self-join that squares the label
    chain shortcut, so k jumps reduce the round count to
    O(log(diameter) / k) at ~half a round's cost per extra jump — a win
    whenever per-round fixed cost (checkpoint + probe job) dominates,
    i.e. always in the streaming/interactive regime.

    ``local_threshold`` — symmetric-edge count at or below which the labels
    are resolved by a single-task union-find instead of the iterative
    distributed loop (same regime split as forest_roots: the loop's
    per-round fixed cost dominates small graphs by 10×, while graphs past
    the gate are data-bound and need the shuffle parallelism).  Pass 0 to
    force the distributed path.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # pin a partitioning proportional to the edge count: the loop pays fixed
    # per-partition cost every round, so small graphs should not inherit the
    # session-wide shuffle parallelism (AQE can't help inside the loop —
    # localCheckpoint materializes before coalescing)
    n_edges = sym.count()
    if local_threshold > 0 and n_edges <= local_threshold:
        return _local_connected_components(sym)
    n_parts = max(2, min(int(sym.sparkSession.conf.get("spark.sql.shuffle.partitions")),
                         n_edges // 50_000 + 2))
    sym = sym.repartition(n_parts, "b").localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

    for i in range(max_iter):
        # step 1: candidate label = min over neighbors' labels ∪ own
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"], "inner")
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # step 2: pointer-jump — component ← component's component.  Plain
        # hash-min needs O(diameter) rounds (linear on chain graphs); each
        # jump squares the shortcut depth, so k jumps/round give
        # O(log(diameter)/k) total rounds.
        for _ in range(jumps_per_round):
            jump = new_labels.select(
                F.col("node").alias("component"),
                F.col("component").alias("component2"),
            )
            new_labels = (
                new_labels.join(jump, "component", "left")
                .select(
                    "node",
                    "old_component",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("component2"), F.col("component")),
                    ).alias("component"),
                )
            )
        # convergence flag rides along — no extra join-per-round
        new_labels = (
            new_labels
            .withColumn("moved", F.col("component") != F.col("old_component"))
            .drop("old_component")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("moved")).limit(1).count()
        labels = new_labels.drop("moved")
        if changed == 0:
            break
    return labels
