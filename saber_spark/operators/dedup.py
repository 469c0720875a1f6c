"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of each):

- **exact_dedup** — one hash-groupBy on md5(normalized text): shuffle
  volume is one 32-char hash + id per row; survivors = min(id) per
  group. At 100 TB this is the cheapest possible full dedup (single
  shuffle, map-side partial aggregation of the min).
- **jaccard_pairs** — inverted-index self-join on shingles: explode
  distinct shingles, join on shingle, count common shingles per pair. Never a cross
  join; cost ∝ Σ posting-list², controlled by dropping ultra-frequent
  shingles (stop_df) exactly like a search engine drops stopwords.
- **minhash_lsh_pairs** — k independent MinHashes (min of md5(seed:s)
  per doc — min of hex strings, engine-portable), candidates = pairs
  sharing ≥1 minhash (banding with r=1: recall 1-(1-J)^k, ≈1 for
  J ≥ 0.5 at k=16), then exact-Jaccard verification of candidates only.
  At scale the candidate join is groupBy(seed, minhash) — tiny compared
  to all-pairs.
- **simhash** — 60-bit signature from per-token md5 bits (±1 vote per
  bit, pure Catalyst expressions, no UDF); near-dup pairs join on any of
  four 15-bit bands. Pigeonhole: hamming ≤ 3 bits can touch ≤ 3 bands,
  so ≥ 1 band matches — band-join recall is exactly 1 for the
  hamming ≤ 3 predicate while joining on 15-bit keys instead of
  comparing all pairs.

Embedding-cosine near-dup lives in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.textops import normalize_text, word_shingles

SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 15 bits each


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups by content hash; emits (content_hash, keep_id, n_copies)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingle_posts(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"), F.explode(word_shingles(text_col, n)).alias("_s")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    stop_df: int | None = None,
) -> DataFrame:
    """All pairs with shingle-Jaccard >= threshold via inverted index.

    ``stop_df``: drop shingles appearing in more than this many docs
    (posting-list explosion guard for web-scale corpora; None = keep all
    — exact, used when the oracle must match all-pairs Jaccard).
    """
    posts = _shingle_posts(df, id_col, text_col, n)
    if stop_df is not None:
        hot = posts.groupBy("_s").count().where(F.col("count") > stop_df).select("_s")
        posts = posts.join(hot, "_s", "left_anti")
    sizes = posts.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a, b = posts.alias("a"), posts.alias("b")
    common = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c")), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Test-set decontamination: flag every corpus document sharing at
    least one n-word shingle with a benchmark/eval document — the
    cross-corpus contamination gate of a training-data pipeline (the
    within-corpus dedups above remove self-duplicates; this removes
    leakage of held-out evaluation text). Published precedent: the
    n-gram-overlap scrubbing of GPT-3 appendix C / PaLM appendix.

    Returns the corpus with a ``contaminated`` boolean appended; callers
    drop flagged rows (kept as a flag so the registry row value-checks
    BOTH partitions of the corpus, not just the survivors).

    Scale shape: eval sets are tiny next to a 100-TB corpus, so the
    benchmark's distinct-shingle set is broadcast (hash-join, corpus
    never shuffled for the probe); the contaminated-id set is one
    semi-join + distinct, and the flag join-back is id-equi. Set
    ``broadcast_benchmark=False`` for a pathological benchmark too big
    to broadcast — the probe degrades to a shuffled shingle equi-join,
    still never all-pairs.
    """
    bench = benchmark.select(
        F.explode(word_shingles(text_col, n)).alias("_s")
    ).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    posts = _shingle_posts(corpus, id_col, text_col, n)
    hit_ids = (
        posts.join(bench, "_s", "left_semi")
        .select(F.col("_id").alias(id_col))
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return corpus.join(hit_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce("contaminated", F.lit(False))
    )


def minhash_signatures_wide(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, k: int = 16,
) -> DataFrame:
    """(_id, _m0.._m{k-1}): k MinHashes per doc — min over shingles of
    md5('<seed>:'||shingle).

    md5 hex strings order identically in every engine — no integer
    conversion, fully portable to the SQL oracle.
    """
    posts = _shingle_posts(df, id_col, text_col, n)
    # k min-aggregates in ONE groupBy over the shingle postings — not a
    # k-way seed explode: same values, k× less shuffle volume, and the
    # md5 calls stay in a single codegen'd projection
    return posts.groupBy("_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("_s")))).alias(f"_m{j}")
            for j in range(k)
        ]
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, k: int = 16,
) -> DataFrame:
    """Exploded (_id, _seed, _minhash) view of the k signatures."""
    wide = minhash_signatures_wide(df, id_col, text_col, n, k)
    return wide.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("_seed"), F.col(f"_m{j}").alias("_minhash")
                    )
                    for j in range(k)
                ]
            )
        ).alias("_x"),
    ).select("_id", F.col("_x._seed").alias("_seed"), F.col("_x._minhash").alias("_minhash"))


def band_structs(k: int, rows_per_band: int, col_of=None) -> Column:
    """The (band id, band key) array every LSH surface shares — batch
    banding (below) and the stream-side per-row banding in
    ``streaming/dedup.py`` MUST build keys identically or candidates
    silently vanish at the join. ``col_of(i)`` maps minhash ordinal ->
    Column (default: the ``_m{i}`` columns of a wide signature)."""
    if col_of is None:
        col_of = lambda i: F.col(f"_m{i}")  # noqa: E731
    n_bands = k // rows_per_band
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("_band"),
                F.concat_ws(
                    "|",
                    *[col_of(b * rows_per_band + i) for i in range(rows_per_band)],
                ).alias("_bk"),
            )
            for b in range(n_bands)
        ]
    )


def row_minhashes(text_col: str | Column, n: int = 3, k: int = 16) -> list[Column]:
    """The k MinHashes as PER-ROW expressions (``array_min`` over the
    shingle array) — bit-identical to ``minhash_signatures_wide``'s
    explode+groupBy form (min over the same md5 values) but with no
    shuffle and no aggregation state, which is what a STREAMING side
    needs: signatures evaluate inside whole-stage codegen per row.
    Batch prefers the grouped form only because its postings are reused
    for verification."""
    sh = word_shingles(text_col, n)

    # a closure per seed — a `lambda s, j=j:` default-arg binding would
    # make the lambda BINARY, and pyspark passes (element, index) to
    # two-parameter transform lambdas: j would silently become the
    # array position, not the seed
    def seed_min(j: int) -> Column:
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
        ).alias(f"_m{j}")

    return [seed_min(j) for j in range(k)]


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH candidate pairs: share at least one full band of
    ``rows_per_band`` consecutive minhashes (b = k/r bands).

    The banding S-curve P(candidate | J) = 1-(1-J^r)^b is the
    precision/recall knob: r=1 catches everything sharing ANY minhash
    (recall ≈1 even at low J — floods the verifier on small-vocabulary
    corpora); r=2, b=8 keeps recall >0.9998 for J ≥ 0.8 while pruning
    low-J pairs aggressively. Join key is (band_id, band_key) — a plain
    hash-partitioned equi-join, never all-pairs.
    """
    if k % rows_per_band != 0:
        raise ValueError(f"rows_per_band {rows_per_band} must divide k {k}")
    wide = minhash_signatures_wide(df, id_col, text_col, n, k)
    bands = wide.select(
        "_id", F.explode(band_structs(k, rows_per_band)).alias("_x")
    ).select("_id", F.col("_x._band").alias("_band"), F.col("_x._bk").alias("_bk"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bk") == F.col("b._bk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    threshold: float = 0.5,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: banded candidates, then exact-Jaccard
    verification computed over the CANDIDATE DOCS ONLY. Returns
    (id_a, id_b, jaccard >= threshold).

    Scale shape: the shingle postings are semi-joined down to ids that
    appear in at least one candidate pair before the posting self-join —
    the expensive Σ posting-list² verification cost is paid only for the
    (small) candidate subset, which is the entire point of LSH. The
    final semi join to the candidate set drops co-shingling
    non-candidate pairs, keeping the output exactly "LSH candidates
    verified" (tests/test_pipeline_ops.py measures the pruning).

    Recall note: banding is probabilistic (see minhash_lsh_candidates).
    When the output must equal all-pairs Jaccard (an oracle-checked
    run), use ``rows_per_band=1``: P(candidate | J=0.5) = 1-(1-J)^16
    ≥ 0.99998, corpus-independent. The r=2 default is the production
    precision/recall knob — it prunes the verifier hard but its recall
    near the threshold must be validated per corpus (the recall test
    does exactly that on the benchmark corpus).
    """
    cands = minhash_lsh_candidates(df, id_col, text_col, n, k, rows_per_band)
    posts = _shingle_posts(df, id_col, text_col, n)
    cand_ids = (
        cands.select(F.col("id_a").alias("_id"))
        .unionByName(cands.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    # postings restricted to candidate docs; a doc keeps ALL its shingles,
    # so per-doc sizes (the Jaccard denominator) are unchanged
    posts_c = posts.join(cand_ids, "_id", "left_semi")
    sizes = posts_c.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    pa, pb = posts_c.alias("a"), posts_c.alias("b")
    common = (
        pa.join(pb, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c")), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _hex_digit(h: Column, pos: int) -> Column:
    """Value 0..15 of hex char at 1-based pos (portable instr trick)."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(h, pos, 1)) - 1


def _local_checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Eager localCheckpoint + the persistent-RDD ids it created, so the
    caller can free the blocks when the iteration no longer needs them
    (``Dataset.unpersist()`` does NOT release checkpoint blocks — only
    the block-manager handle does). Id attribution is a before/after
    diff of ``getPersistentRDDs``; fine for a single-threaded driver
    loop, which is the only place this is used."""
    jsc = df.sparkSession.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    created = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    return out, created


def _unpersist_rdd_ids(df: DataFrame, ids: set[int]) -> None:
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    check_every: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (node,
    component_id = min doc id in the component). The clustering step
    every dedup pipeline needs after pair generation: pick one canonical
    doc per duplicate cluster (pairs alone can chain A~B~C with A≁C).

    Distributed min-label propagation: each round, every node takes the
    minimum label among itself and its neighbours (one shuffle per
    round); converges in O(graph diameter) rounds — near-dup clusters
    are tiny and dense, so a handful. Driver-action discipline for the
    10^11-edge regime: the convergence count runs every ``check_every``
    rounds, not every round (propagation is monotone, so one unchanged
    step is a fixpoint whenever it is observed), each round's
    checkpoint frees the previous round's blocks (block-manager memory
    stays O(1) in rounds), and a budget exhaust raises instead of
    returning unverified labels. For graphs with large diameter, use
    ``connected_components_star`` (below): large-star/small-star
    contraction, O(log n) rounds, same output contract.

    ``stats``: optional dict filled with {"rounds", "convergence_checks"}
    (asserted by tests/test_pipeline_ops.py).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # localCheckpoint (eager) truncates the logical plan each round —
    # iterative DataFrame algorithms otherwise double their plan per
    # iteration (analysis/codegen cost grows exponentially, then OOMs
    # long before the data does)
    edges, edge_ids = _local_checkpoint_tracked(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    labels, label_ids = _local_checkpoint_tracked(
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    rounds = 0
    checks = 0
    converged = False
    try:
        while rounds < max_iter and not converged:
            nbr_min = (
                edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
                .withColumnRenamed("src", "node")
            )
            new_labels, new_ids = _local_checkpoint_tracked(
                labels.join(nbr_min, "node", "left").select(
                    "node",
                    F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                        "label"
                    ),
                )
            )
            rounds += 1
            if rounds % check_every == 0 or rounds == max_iter:
                checks += 1
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "node")
                    .where(F.col("n.label") != F.col("o.label"))
                    .count()
                )
                converged = changed == 0
            _unpersist_rdd_ids(labels, label_ids)
            labels, label_ids = new_labels, new_ids
    finally:
        _unpersist_rdd_ids(edges, edge_ids)
        if stats is not None:
            stats["rounds"] = rounds
            stats["convergence_checks"] = checks
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach a verified fixpoint in "
            f"{max_iter} rounds — graph diameter exceeds the budget; raise "
            "max_iter or use a star-contraction variant"
        )
    # the final labels stay checkpointed: the caller consumes them next
    return labels.select("node", F.col("label").alias("component_id"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    check_every: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same output contract as ``connected_components`` (node,
    component_id = min id in the component), but converging in
    O(log n) rounds instead of O(diameter): the variant to use when
    near-dup chains are long (crawl mirrors, boilerplate cascades) or
    the graph is web-scale.

    Each round is two grouped aggregations + joins:
    - large-star: every node's strictly-larger neighbours re-attach to
      the minimum of its neighbourhood (including itself);
    - small-star: orient edges child=max → parent=min, then every
      node's smaller neighbours (and itself) re-attach to the minimum
      parent.
    At the fixpoint every surviving edge is (node → component root).
    Driver-action discipline matches connected_components: convergence
    (edge-set fixpoint via symmetric difference) checked every
    ``check_every`` rounds, per-round checkpoints freed, budget exhaust
    raises.
    """
    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .unionByName(pairs.select(F.col(id_b).alias("node")))
        .distinct()
    )
    nodes, node_ids = _local_checkpoint_tracked(nodes)
    # undirected edge set, canonical (small, large) orientation, no loops
    edges = pairs.select(
        F.least(F.col(id_a), F.col(id_b)).alias("s"),
        F.greatest(F.col(id_a), F.col(id_b)).alias("l"),
    ).where(F.col("s") != F.col("l")).distinct()
    edges, edge_ids = _local_checkpoint_tracked(edges)

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric neighbour view: (u, v)
        sym = e.select(F.col("s").alias("u"), F.col("l").alias("v")).unionByName(
            e.select(F.col("l").alias("u"), F.col("s").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
        out = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))  # strictly-larger neighbours
            .select(F.least("v", "m").alias("s"), F.greatest("v", "m").alias("l"))
            .where(F.col("s") != F.col("l"))
            .distinct()
        )
        return out

    def small_star(e: DataFrame) -> DataFrame:
        # orient child = larger, parent = smaller; group children
        mins = e.groupBy("l").agg(F.min("s").alias("m"))
        attached = (
            e.join(mins, "l")
            .select(F.col("s").alias("v"), F.col("m"))  # smaller nbrs -> min parent
            .unionByName(mins.select(F.col("l").alias("v"), F.col("m")))  # node itself
            .where(F.col("v") != F.col("m"))
            .select(F.least("v", "m").alias("s"), F.greatest("v", "m").alias("l"))
            .distinct()
        )
        return attached

    rounds = 0
    checks = 0
    converged = False
    try:
        while rounds < max_iter and not converged:
            new_edges, new_ids = _local_checkpoint_tracked(
                small_star(large_star(edges))
            )
            rounds += 1
            if rounds % check_every == 0 or rounds == max_iter:
                checks += 1
                diff = (
                    new_edges.exceptAll(edges).limit(1).count()
                    + edges.exceptAll(new_edges).limit(1).count()
                )
                converged = diff == 0
            _unpersist_rdd_ids(edges, edge_ids)
            edges, edge_ids = new_edges, new_ids
        if not converged:
            raise RuntimeError(
                f"connected_components_star did not reach an edge fixpoint in "
                f"{max_iter} rounds (expected O(log n)); raise max_iter"
            )
        # fixpoint: every edge is (root=s, node=l); roots label themselves.
        # Materialize the labels before freeing the inputs they read from
        # (unpersisted checkpoints cannot recompute).
        labels, _ = _local_checkpoint_tracked(
            nodes.join(
                edges.select(
                    F.col("l").alias("node"), F.col("s").alias("component_id")
                ),
                "node",
                "left",
            ).select(
                "node", F.coalesce("component_id", F.col("node")).alias("component_id")
            )
        )
        return labels
    finally:
        _unpersist_rdd_ids(nodes, node_ids)
        _unpersist_rdd_ids(edges, edge_ids)
        if stats is not None:
            stats["rounds"] = rounds
            stats["convergence_checks"] = checks


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "packed",
) -> DataFrame:
    """60-bit SimHash from distinct-token md5 bits (pure expressions).

    bit i of token-hash = (hexdigit(md5, i//4) >> (i%4)) & 1; each token
    votes ±1 per bit; signature bit set where the vote sum is positive.

    ``method='wide'`` is the textbook form: one ``sum(bit*2-1)`` per bit
    — 60 aggregation buffers per group (488 B of hash-agg row per doc,
    the allocation pressure BENCH/BASELINE.md measured as this shape's
    scaling ceiling). ``method='packed'`` (default) packs THREE 20-bit
    vote counters into each long — votes are encoded {0,2} instead of
    {-1,+1} so fields only ever accumulate upward (no borrows across
    field boundaries) — cutting the state to 20 packed sums + 1 count.
    Decode: counter_i > n_tokens ⟺ vote_sum_i > 0, since
    enc_sum = vote_sum + n. Bit-identical signatures by integer
    arithmetic (parity-tested); safe for up to 2^19 - 1 = 524,287
    distinct tokens per document (a doc beyond that would need a >5 MB
    vocab in one row) — at n = 2^19 the {0,2}-encoded field hits 2^20
    and would carry into its neighbour, so the plan guards the bound
    with raise_error rather than corrupt a signature silently.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(normalize_text(text_col), " "))).alias("_t"),
    ).withColumn("_h", F.md5(F.col("_t")))

    def bit_at(i: int) -> Column:
        digit = _hex_digit(F.col("_h"), i // 4 + 1)
        return F.floor(digit / (2 ** (i % 4))).cast("long") % 2

    if method == "wide":
        votes = [F.sum(bit_at(i) * 2 - 1).alias(f"_v{i}") for i in range(SIMHASH_BITS)]
        sums = toks.groupBy("_id").agg(*votes)
        vote_pos = [F.col(f"_v{i}") > 0 for i in range(SIMHASH_BITS)]
    elif method == "packed":
        FIELD_BITS, PER_LONG = 20, 3
        n_longs = -(-SIMHASH_BITS // PER_LONG)
        packed = []
        for l in range(n_longs):
            fields = range(l * PER_LONG, min((l + 1) * PER_LONG, SIMHASH_BITS))
            enc = None
            for off, i in enumerate(fields):
                term = F.shiftleft(bit_at(i) * 2, FIELD_BITS * off)
                enc = term if enc is None else enc + term
            packed.append(F.sum(enc).alias(f"_p{l}"))
        sums = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"), *packed)
        vote_pos = [
            (
                F.shiftright(F.col(f"_p{i // PER_LONG}"), FIELD_BITS * (i % PER_LONG))
                % (2**FIELD_BITS)
            )
            > F.col("_n")
            for i in range(SIMHASH_BITS)
        ]
    else:
        raise ValueError(f"simhash: unknown method {method!r} (wide|packed)")
    sig = None
    for i in range(SIMHASH_BITS):
        term = F.when(vote_pos[i], F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    if method == "packed":
        # loud failure at the packing bound (cannot be column-pruned
        # away: the signature itself routes through the guard)
        sig = F.when(F.col("_n") < F.lit(2**19), sig).otherwise(
            F.raise_error(
                F.lit(
                    "simhash(method='packed'): more than 2^19 - 1 distinct "
                    "tokens in one document overflows a 20-bit packed vote "
                    "counter — use method='wide' for this corpus"
                )
            ).cast("long")
        )
    return sums.select(F.col("_id").alias(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 15-bit band
    join (exact for max_hamming <= SIMHASH_BANDS - 1 by pigeonhole)."""
    sig = simhash(df, id_col, text_col)
    width = SIMHASH_BITS // SIMHASH_BANDS
    # integer shifts, not floor(x / 2^k): double division drops low bits
    # of 60-bit signatures (simhash > 2^53)
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        *[
            (F.shiftright(F.col("simhash"), width * b) % (2**width)).alias(f"_b{b}")
            for b in range(SIMHASH_BANDS)
        ],
    )
    # one equi-join per band, unioned — each is a hash join keyed on a
    # 15-bit value (an OR-of-bands condition would degrade to a nested
    # loop join; the union keeps every probe hash-partitioned)
    per_band = []
    for b in range(SIMHASH_BANDS):
        a, b_ = bands.alias("a"), bands.alias("b")
        per_band.append(
            a.join(
                b_,
                (F.col(f"a._b{b}") == F.col(f"b._b{b}"))
                & (F.col("a._id") < F.col("b._id")),
            ).select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
        )
    pairs = per_band[0]
    for p in per_band[1:]:
        pairs = pairs.unionByName(p)
    return pairs.where(F.col("hamming") <= max_hamming).distinct()


# --------------------------------------------------------------------------
# Cross-document duplicated-substring spans (Lee et al. 2021 style)
# --------------------------------------------------------------------------

def _token_ngram_positions(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, pos, g): md5 of the n-token window starting at 0-based
    token position ``pos`` of the normalized text. Docs shorter than n
    tokens emit nothing. Pure Catalyst (split + transform + posexplode);
    row count = Σ max(0, tokens-n+1) ≈ corpus token count — the same
    order as tokenizing the corpus, which any substring-dedup pass pays.

    """
    from saber_spark.operators.textops import words

    w = words(F.col(text_col))
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.md5(F.array_join(F.slice(w, i + 1, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("pos", "g")
    )


def _fan_out_if_underparallel(df: DataFrame) -> DataFrame:
    """Gram construction is CPU-bound (md5 per token position, an
    interpreted higher-order function), so parallelism must match
    cores: when the scan under-parallelizes (few small input files — a
    bench/test artifact; at real scale parquet splits give natural
    parallelism), fan the compact pre-explode rows out first. The guard
    never fires when input partitions already cover the cluster, so no
    shuffle is added at scale."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def _duplicated_hits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int,
    max_docs: int | None,
) -> DataFrame:
    """(doc_id, pos) of every token position whose n-gram occurs in
    ≥ min_docs (and, with the boilerplate cap, ≤ max_docs) distinct
    docs — the ONE construction both the span and the clean-text
    operators derive from. Production pipelines computing both outputs
    should build this once (persist or pass through a single plan)
    rather than calling the two public operators separately."""
    df = _fan_out_if_underparallel(df)
    grams = _token_ngram_positions(df, id_col, text_col, n)
    stats = grams.groupBy("g").agg(F.count_distinct("doc_id").alias("df_docs"))
    dup = stats.where(F.col("df_docs") >= min_docs)
    if max_docs is not None:
        dup = dup.where(F.col("df_docs") <= max_docs)
    return grams.join(dup.select("g"), "g").select("doc_id", "pos")


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    max_docs: int | None = None,
) -> DataFrame:
    """Exact duplicated-substring spans ACROSS documents — the
    distributed n-gram approximation of suffix-array substring dedup
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better": remove exact token runs appearing in more than one
    document). A token position is duplicated when the n-token window
    starting there occurs in ≥ ``min_docs`` distinct docs; overlapping /
    adjacent duplicated windows merge into maximal spans.

    Returns (doc_id, span_start, span_end, n_dup_grams): token-index
    half-open span [span_start, span_end) plus the number of duplicated
    n-gram positions merged into it.

    Scale design: one map-side-combinable groupBy on the 32-char gram
    hash (count-distinct-docs is a two-phase partial aggregate), one
    hash equi-join of positions against the duplicated-gram set, and a
    per-doc window for interval merge (shuffles by doc_id — bounded by
    per-doc hit count). Never all-pairs, never a cartesian. ``max_docs``
    is the boilerplate guard: ultra-frequent n-grams (site chrome,
    license headers) explode the hit join at 100 TB exactly like
    stopword postings — cap their doc frequency and handle boilerplate
    with a dedicated pass instead.
    """
    from pyspark.sql import Window

    hits = _duplicated_hits(df, id_col, text_col, n, min_docs, max_docs)

    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        "doc_id",
        "pos",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("ni"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("ni").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n).cast("long").alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .drop("island")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    max_docs: int | None = None,
) -> DataFrame:
    """Clean-text companion to :func:`duplicate_ngram_spans`: for every
    AFFECTED doc (≥1 duplicated position), drop all tokens covered by
    any duplicated n-gram window and re-join the survivors in order.
    Docs whose every token is covered disappear (nothing survives) —
    the caller unions untouched docs back if it wants the full corpus.

    Returns (doc_id, clean_text).

    Scale: covered-position expansion is hits × n rows (duplicated
    positions only, not the corpus); the token-level anti-join and the
    ordered re-assembly both shuffle by doc_id only.
    """
    from saber_spark.operators.textops import words

    df = _fan_out_if_underparallel(df)
    hits = _duplicated_hits(df, id_col, text_col, n, min_docs, max_docs)

    covered = hits.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("p"),
    ).distinct()
    affected = hits.select("doc_id").distinct()
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(F.col(text_col))).alias("p", "tok"),
    ).join(affected, "doc_id")
    kept = toks.join(covered, ["doc_id", "p"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text")
    )
