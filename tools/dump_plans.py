"""Generates docs/PLANS.md: formatted physical plans of the engine's
hot operators with scale annotations — the evidence that filters push
down, joins broadcast/co-partition, and aggregations partial-combine.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hugegraph_computer_spark.algorithms import PageRank, triangle_count
from hugegraph_computer_spark.graph import Graph, transcripts_from_events
from hugegraph_computer_spark.session import get_spark


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    g = Graph.from_transcripts(transcripts_from_events(spark, sf), partitions=8)
    g.num_vertices

    sections = []

    # 1. column pruning + predicate pushdown on the parquet scan
    pruned = (
        spark.read.parquet(f"{sf}/events.parquet")
        .where(F.col("event_type") == "click")
        .select("user_id", "ts")
    )
    sections.append(
        (
            "Parquet scan: pushdown + pruning",
            "The filter reaches the scan (PushedFilters) and only the two "
            "projected columns are read (ReadSchema) — at 100 TB this is "
            "the difference between reading 2 columns and reading 6.",
            fmt(pruned),
        )
    )

    # 2. one PageRank superstep (scatter -> gather -> update -> agg)
    pr = PageRank(l1_tol=0.0, max_supersteps=3)
    pr.prepare(g)
    out0 = pr.superstep0(g)
    st0 = out0.state.localCheckpoint(eager=True)
    msgs0 = out0.make_messages(st0)
    out1 = pr.superstep(1, g, st0, msgs0, {
        "cumulative_rank": 1.0, "dangling_cumulative": 0.0,
    })
    sections.append(
        (
            "PageRank superstep (state update)",
            "gather = HashAggregate(sum) with a partial aggregate below "
            "the Exchange (map-side combine == the reference's send-buffer "
            "combiner, CombineKvInnerSortFlusher.java:29-45); the scatter/"
            "update joins hash-join against the LINEAGE-CUT edge table "
            "(round 6: Scan ExistingRDD leaf — the full derivation subtree "
            "no longer re-plans every superstep; step plan 1532 -> 166 "
            "lines, plans/r06/). Two shuffles per superstep: messages by "
            "dst + state co-location.",
            fmt(out1.state),
        )
    )

    # 3. triangle count joins
    sections.append(
        (
            "TriangleCount (degree-ordered wedge enumeration)",
            "Edges oriented low->high under rank(x) = (degree(x), id(x)): "
            "every triangle is one wedge at its lowest-rank corner, closed "
            "by a semi-join — candidate volume bounded by O(E*arboricity) "
            "instead of hub-deg^2 (round-6 fix; noop-sink A/B at sf0.1: "
            "143-180 s id-oriented vs 2.5 s degree-oriented). Pure hash "
            "joins, no adjacency arrays, no Python; this replaces the "
            "reference's bespoke superedge message cache "
            "(TriangleCount.java:87-172).",
            fmt(triangle_count(g)),
        )
    )

    # 4. random-walk step: pick against degree table, then TWO-KEY join
    from hugegraph_computer_spark.pipeline.walks import random_walks

    sections.append(
        (
            "Random-walk step (two-phase, hub-proof)",
            "Phase 1 joins the walker frontier with the O(V) degree table "
            "to compute the picked edge index; phase 2 is an equi-join on "
            "BOTH keys (cur, pick) == (e_src, e_idx) — the join output is "
            "one row per walker regardless of hub degree. Look for the "
            "two-column join keys in the BuildRight/SortMergeJoin node: a "
            "single-key join + filter would instead materialize deg(v) "
            "rows per walker before filtering.",
            fmt(random_walks(g, walk_len=2, walks_per_node=1)),
        )
    )

    # 5. shingling: pure projection, zero Exchange
    from hugegraph_computer_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        shingles,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sections.append(
        (
            "Shingling (zero-shuffle projection)",
            "Word trigrams via transform(sequence(...)) + array_distinct + "
            "explode over the token array: NO Exchange anywhere in the "
            "plan — the previous posexplode + positional self-join "
            "formulation cost three shuffles for the same rows.",
            fmt(shingles(docs)),
        )
    )

    # 6. MinHash-LSH: the Jaccard verify only touches candidate pairs
    sections.append(
        (
            "MinHash-LSH near-dup (candidate-pairs-only verify)",
            "Candidates come from the banded (band, bucket) self-join; the "
            "exact-Jaccard verify joins candidates -> per-doc shingles -> "
            "matching shingles of the other side. There is NO corpus-wide "
            "shingle-shingle self-join below the verify aggregate — the "
            "full-corpus pair explosion LSH exists to avoid never happens. "
            "(num_perm/bands reduced here; plan shape is identical.)",
            fmt(minhash_lsh_pairs(docs, num_perm=8, bands=4)),
        )
    )

    # 7. cosine near-dup: sign-bucketed candidates (the gated path)
    from hugegraph_computer_spark.pipeline.similarity import (
        cosine_neardup_pairs,
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    sections.append(
        (
            "Cosine near-dup (sign-bucketed, gated path)",
            "Candidates meet only inside matching hyperplane-sign buckets "
            "(equi-join on `bucket`), exact cosine verified in-bucket — "
            "no CartesianProduct/BroadcastNestedLoopJoin node anywhere. "
            "The all-pairs crossJoin variant exists only as the pytest "
            "recall oracle.",
            fmt(cosine_neardup_pairs(emb, threshold=0.4, n_planes=2)),
        )
    )

    # 8. bucketed store: src-keyed agg with NO Exchange at all
    from hugegraph_computer_spark.graph import (
        load_graph_bucketed,
        save_graph_bucketed,
    )

    save_graph_bucketed(g, "plans_bstore", buckets=8)
    bucketed = load_graph_bucketed(spark, "plans_bstore", cache=False)
    sections.append(
        (
            "Bucketed graph store (zero-shuffle load + agg)",
            "The persisted tables are bucketBy(id)/bucketBy(src), so the "
            "hash clustering is part of the table layout: this "
            "groupBy(src) aggregation contains NO Exchange node — the "
            "scan itself satisfies the required distribution. The "
            "file-based store must repartition on every load; at 100 TB "
            "the bucketed layout amortizes that shuffle into the one-time "
            "ingest (Iceberg sorted/bucketed layout on a real cluster).",
            fmt(bucketed.edges.groupBy("src").agg(F.sum("weight").alias("w"))),
        )
    )
    spark.sql("DROP TABLE IF EXISTS plans_bstore_vertices")
    spark.sql("DROP TABLE IF EXISTS plans_bstore_edges")

    # 9a. cc_fast round: one E-sized + two V-sized shuffles
    from hugegraph_computer_spark.algorithms.cc_fast import (
        cc_round,
        symmetrize,
    )

    sym = symmetrize(g.edges)
    cc_state = g.vertices.select("id", F.col("id").alias("comp"))
    sections.append(
        (
            "Fast connected components — one relax+notify+jump round",
            "Exactly ONE E-sized Exchange (the relax scatter join + "
            "min-combine, with a partial aggregate below it) and two "
            "V-sized Exchanges over 16-byte (id, comp) rows (notify "
            "groupBy(old_comp) and the jump self-join). The round count "
            "is O(log d) (measured: 5 rounds at sf0.1 where the "
            "reference-style one-hop loop needs 17 supersteps), so at "
            "10^12-turn scale the engine pays ~5 E-sized shuffles for a "
            "full components run instead of one per unit of graph "
            "diameter.",
            fmt(cc_round(sym, cc_state)),
        )
    )

    # 9b. HITS half-round: E-shuffle gather with partial agg
    from hugegraph_computer_spark.algorithms.hits import _gather

    de = g.edges.select("src", "dst").dropDuplicates(["src", "dst"])
    h0 = g.vertices.select("id", F.lit(1.0).alias("hub"))
    sections.append(
        (
            "HITS half-round gather (auth from hub)",
            "One dst-keyed HashAggregate(sum) with the partial aggregate "
            "below the Exchange — identical shape to the PageRank gather, "
            "so HITS inherits every scaling measurement. The L2 norms are "
            "driver scalars (one union-agg action per full round), never "
            "a window or a second pass over E.",
            fmt(_gather(de, h0, "src", "dst", "hub")),
        )
    )

    # 9c. ANF sketch round: constant-width bit_or merge
    from hugegraph_computer_spark.algorithms.anf import (
        _seed_exprs,
        _sym,
    )

    und_anf = _sym(g.edges, None)
    fm0 = g.vertices.selectExpr("id", *_seed_exprs(4))
    msgs = (
        und_anf.join(fm0.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(*[F.expr(f"bit_or(r{j})").alias(f"m{j}") for j in range(4)])
    )
    sections.append(
        (
            "ANF sketch round (Flajolet-Martin bit_or merge)",
            "The per-hop register merge is ONE E-sized Exchange whose "
            "rows are (id, k longs) — constant width regardless of ball "
            "size, with bit_or partial-aggregated below the shuffle. "
            "Compare the exact mode, whose per-hop dedup shuffles the "
            "materialized balls themselves (Theta(sum |B(v,h)|) rows): "
            "this plan is why the sketch is the 100-TB path.",
            fmt(msgs),
        )
    )

    # 9d. k-truss support round: wedge join + closing semi-join
    from hugegraph_computer_spark.algorithms.truss import _wedge_support

    canon = (
        g.undirected_single()
        .edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    sections.append(
        (
            "k-truss support round (wedge join + closing semi-join)",
            "Triangle support per edge: the wedge self-join on the middle "
            "vertex, closed by a LEFT-SEMI join (no triangle row "
            "materializes wider than (a,b,c)), then a 3-way union + "
            "HashAggregate with map-side partial combine. AQE skew-join "
            "splits hub pivots at runtime; the degree-orientation "
            "refinement (pivot = lowest-degree endpoint) slots into this "
            "one function if arboricity-bounded fan-out is ever needed.",
            fmt(_wedge_support(canon)),
        )
    )

    # 9e. Adamic-Adar: capped pivot fan-out + anti-join
    from hugegraph_computer_spark.algorithms.linkpred import adamic_adar

    sections.append(
        (
            "Adamic-Adar link prediction (capped pivots, top-k)",
            "Candidate pairs come from a self-join co-located on the "
            "pivot z AFTER the degree cap (max_degree) is applied — the "
            "deg^2 hub blowup never reaches the shuffle. Existing edges "
            "leave via a left-anti join, and the final top-k is "
            "TakeOrderedAndProject (no full sort at any scale).",
            fmt(adamic_adar(g, max_degree=32, k=100)),
        )
    )

    # 9f. stratified sample: rank-limit pushdown below the shuffle
    from hugegraph_computer_spark.pipeline.sampling import stratified_sample

    sections.append(
        (
            "Stratified sample (WindowGroupLimit pushdown)",
            "Deterministic per-stratum top-n under an md5 permutation: "
            "Spark's rank-limit pushdown inserts a PARTIAL "
            "WindowGroupLimit below the Exchange, so each map task ships "
            "only its local top-n per stratum — the shuffle carries "
            "O(n * strata) rows, not the corpus. rand()-based sampling "
            "could not be oracled and would resample on every retry.",
            fmt(stratified_sample(docs, group_col="lang", n=20)),
        )
    )

    # 9. read_transcripts: name-select keeps projection pushdown intact
    from hugegraph_computer_spark.graph import read_transcripts

    t = transcripts_from_events(spark, sf)
    t.write.mode("overwrite").parquet("/tmp/plans_transcripts.parquet")
    sections.append(
        (
            "Transcript source loader (pushdown-preserving)",
            "read_transcripts validates + casts by NAME over any source "
            "kind (catalog table / parquet / csv / json / orc); a "
            "downstream 2-column projection still prunes the parquet scan "
            "to those columns (ReadSchema) — the canonicalizing select "
            "does not materialize the full width.",
            fmt(
                read_transcripts(spark, "/tmp/plans_transcripts.parquet")
                .select("conv_id", "turn_idx")
                .where(F.col("turn_idx") > 0)
            ),
        )
    )

    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan evidence\n\n"
            "Generated by tools/dump_plans.py (sf0.001, local[4]); the\n"
            "plan SHAPES are size-independent, only AQE's runtime choices\n"
            "(broadcast vs shuffle, coalescing) change with scale.\n\n"
        )
        for title, note, plan in sections:
            f.write(f"## {title}\n\n{note}\n\n```\n{plan}\n```\n\n")
    print("wrote docs/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
