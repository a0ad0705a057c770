"""Connected components over a duplicate-pair graph.

The dedup operators (operators/dedup.py, operators/similarity.py) emit
candidate PAIRS; a training-data pipeline then needs the transitive
closure — "these 17 documents are all one duplicate cluster, keep one" —
before it can drop rows. The reference has no graph stage (it is a
record-at-a-time Beam pipeline), so this is part of the LLM-pipeline
operator suite, built Spark-first.

Algorithm: min-label propagation. Every node starts labelled with its own
id; each round every node takes the minimum label among itself and its
neighbours; at a fixpoint each node carries the smallest id of its
component. Rounds are plain shuffle joins, so Catalyst/AQE plan each one
(broadcast when the frontier is small, skew-split when one cluster is
hot).

Scale notes (100 TB):
* Convergence is O(log diameter) EDGE rounds: after every non-final hook
  round the labels are path-compressed with two pointer-doubling hops
  (the Shiloach–Vishkin shortcut; same O(log n) round bound the
  alternating large-star/small-star variant of Kiveris et al.,
  "Connected Components in MapReduce and Beyond", achieves). This
  matters on VERIFIED near-dup graphs, which are chains, not cliques
  (A~B and B~C can both clear the Jaccard threshold while A~C misses):
  the sf0.1 exact-ngram graph has diameter 7 and took 8 full-edge
  rounds before compression, 5 after — and each compress hop joins only
  the fixed-width (id, label) table with itself, never the edges.
* The symmetrized edge set is hash-partitioned by the hook-join key
  once, up front (AQE-coalescible — no hardcoded count), and every
  round reuses that distribution: the union that builds it doubles the
  child partition count, and per-task overhead on near-empty partitions
  was two thirds of each round's cost at sf0.1; on a real cluster the
  same move lets the sort-merge hook join skip re-shuffling 2|E| rows
  per round once labels outgrow broadcast.
* Only (id, label) pairs and (src, dst) edges ever shuffle — fixed-width
  longs, never payloads.
* Each round ends with localCheckpoint(eager=True) to truncate lineage —
  otherwise the plan doubles per round and Catalyst analysis time blows
  up long before data does. On a cluster with flaky executors prefer
  spark.sparkContext.setCheckpointDir + .checkpoint() (durable) — the
  trade is an HDFS write per round.
* The per-round convergence probe is a single count() — one scalar to
  the driver per round, not a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    label_col: str = "cluster",
    max_iter: int = 50,
    edges_unique: bool = False,
) -> DataFrame:
    """Label every node with the smallest node id in its component.

    ``edges`` is an undirected pair list (each pair in either or both
    orientations). ``nodes`` optionally supplies the full node universe
    (isolated nodes — no pairs — come out labelled with themselves);
    when omitted the universe is the ids that appear in ``edges``.
    Returns (id_col, label_col), one row per node.

    ``edges_unique=True`` asserts each undirected pair appears EXACTLY
    once (the contract of every pair op in operators/dedup.py: canonical
    doc1 < doc2, globally distinct). The symmetrized set is then unique
    by construction and the distinct() — a full extra shuffle of 2×|E|
    rows that dominated dedup_clusters at sf0.1 — is skipped.
    """
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    sym = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    if not edges_unique:
        # distinct() shuffles once; every round then reuses this
        # materialized edge set
        sym = sym.distinct()
    # one more shuffle, co-locating by the hook-join key. Two payoffs that
    # both survive the checkpoint: (a) the union doubles the child's
    # partition count, and EVERY round scans the edge set — at sf0.1 the
    # per-task overhead of 128 near-empty partitions was 2/3 of each
    # round's cost; a keyed repartition (AQE-coalescible, no hardcoded
    # count) right-sizes it once; (b) when labels outgrow broadcast on a
    # real cluster the sort-merge hook join reuses this distribution
    # instead of re-shuffling 2|E| rows per round.
    sym = sym.repartition(F.col("d")).localCheckpoint(eager=True)

    if nodes is not None:
        universe = nodes.select(F.col(id_col).cast("long").alias("s")).distinct()
    else:
        universe = sym.select("s").distinct()
    labels = universe.select("s", F.col("s").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # each node's best neighbour label this round
        neigh = (
            sym.join(labels.withColumnRenamed("s", "d"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # the improvement flag rides along in the same pass, so convergence
        # needs only a filter-count over the checkpointed result — not a
        # second labels join per round
        new_labels = (
            labels.join(neigh, "s", "left")
            .select(
                "s",
                F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
                (F.coalesce("nlbl", "lbl") < F.col("lbl")).alias("ch"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("ch").count()
        labels = new_labels.drop("ch")
        if changed == 0:
            break
        # pointer-doubling path compression (Shiloach–Vishkin shortcut):
        # lbl always holds a node id of the same component with
        # lbl(v) <= v, so following the label chain one hop —
        # lbl(v) <- lbl(lbl(v)) — stays in-component and is monotone
        # non-increasing. Two hops after each non-final hook round turn
        # O(diameter) edge rounds into O(log diameter) on chain-shaped
        # graphs (verified near-dup edges form chains: A~B and B~C can
        # both clear the threshold while A~C misses it). Each hop joins
        # only the (s, lbl) table with itself — N fixed-width rows, no
        # edges — and is built LAZILY here: it rides into the next hook
        # round's plan and checkpoint, so already-converged graphs (the
        # star-reduced LSH edge sets, diameter <= 2) pay no extra action
        # for it and the per-round probe stays one count().
        for _ in range(2):
            chain = labels.select(
                F.col("s").alias("lbl"), F.col("lbl").alias("lbl2")
            )
            labels = labels.join(chain, "lbl", "left").select(
                "s", F.coalesce("lbl2", "lbl").alias("lbl")
            )

    return labels.select(
        F.col("s").alias(id_col), F.col("lbl").alias(label_col)
    )


def connected_components_oracle_sql(pairs_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB oracle: transitive closure by recursive CTE (exact, viable
    at oracle scale), labelling each doc with the min reachable id.
    ``pairs_sql`` must yield (doc1, doc2)."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        sym AS (
            SELECT doc1 AS s, doc2 AS d FROM pairs
            UNION
            SELECT doc2 AS s, doc1 AS d FROM pairs
        ),
        reach(s, d) AS (
            SELECT {id_col}, {id_col} FROM documents
            UNION
            SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s
        )
        SELECT s AS {id_col}, min(d) AS cluster
        FROM reach GROUP BY s
    """
