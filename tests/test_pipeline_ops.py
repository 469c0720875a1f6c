"""Training-data pipeline operators: invariants beyond the oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from saber_spark.operators import dedup as dd
from saber_spark.operators import multimodal as mm
from saber_spark.operators import similarity as sim
from saber_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_ORACLE, "embeddings")


def test_minhash_lsh_recall_is_total(spark, docs):
    """k=16 r=2 banding must recover every pair with J >= 0.5 here
    (P(candidate)=1-(1-J²)^8; validated exactly on this corpus — the
    oracle's recall-1 assumption)."""
    exact = {
        (r.id_a, r.id_b)
        for r in dd.jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(docs, k=16, threshold=0.5).collect()}
    assert lsh == exact and len(exact) > 0


def test_minhash_lsh_verification_is_pruned(spark, docs):
    """The exact-Jaccard verification must run over candidate docs only —
    the posting self-join volume collapses from Σ(all posting lists)² to
    Σ(candidate posting lists)². On this corpus (500 docs, ~25 near-dup
    pairs) candidates are a small fraction of the corpus, so the postings
    that reach the verify join must shrink accordingly."""
    cands = dd.minhash_lsh_candidates(docs, k=16, rows_per_band=2)
    cand_ids = (
        cands.select(F.col("id_a").alias("_id"))
        .unionByName(cands.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    n_docs = docs.count()
    n_cand_docs = cand_ids.count()
    assert 0 < n_cand_docs < n_docs * 0.5, (
        f"{n_cand_docs}/{n_docs} docs are LSH candidates — pruning is real"
    )
    posts_all = dd._shingle_posts(docs, "doc_id", "text", 3).count()
    posts_cand = (
        dd._shingle_posts(docs, "doc_id", "text", 3)
        .join(cand_ids, "_id", "left_semi")
        .count()
    )
    assert posts_cand < posts_all * 0.5


def test_simhash_separates_near_dups_from_random(spark, docs):
    """Near-dup pairs (Jaccard >= 0.95) must have far smaller hamming
    distance than random pairs (expected ~30 of 60 bits)."""
    near = dd.jaccard_pairs(docs, threshold=0.95).select("id_a", "id_b")
    sig = dd.simhash(docs)
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_ha"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_hb"))
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    near_ham = (
        near.join(a, "id_a").join(b, "id_b").select(ham.alias("h")).toPandas()["h"]
    )
    rand = (
        a.join(b, (F.col("id_b") == F.col("id_a") + 250))
        .select(ham.alias("h"))
        .toPandas()["h"]
    )
    assert len(near_ham) > 0
    # corpus shares a tiny vocabulary, so even random pairs sit ~13 bits
    # apart; the operator's contract is *relative* separation
    assert near_ham.mean() < rand.mean() - 5
    assert rand.mean() > 10


def test_rp_lsh_recall_measured(spark, embs):
    """LSH ANN trades recall for candidate reduction; report + bound it.
    (12 planes, threshold 0.4: same-bucket requirement is strict, so
    recall is partial by design — must be > 0 and candidates ≪ n²)."""
    exact = sim.cosine_pairs(embs, threshold=0.4).count()
    lsh = sim.rp_lsh_pairs(embs, n_planes=12, threshold=0.4).count()
    assert exact > 0
    assert 0 < lsh <= exact
    buckets = sim.rp_lsh_buckets(embs).groupBy("bucket").count().toPandas()
    n = embs.count()
    cand = int((buckets["count"] * (buckets["count"] - 1) / 2).sum())
    assert cand < n * (n - 1) / 2 * 0.05, "bucketing must prune >95% of the pair space"


def test_rp_lsh_multiprobe_recovers_recall(spark, embs):
    """Multiprobe must strictly widen the candidate set over single-bucket
    probing (monotone in n_probes) and lift recall@5 toward the exact
    brute-force top-5, while still probing only n_probes+1 of 2^12
    buckets."""
    queries = embs.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.nbr_id)
        for r in sim.cosine_topk(embs, queries, k=5).collect()
    }

    def recall(n_probes):
        got = {
            (r.query_id, r.nbr_id)
            for r in sim.rp_lsh_topk_multiprobe(
                embs, queries, k=5, n_planes=6, n_probes=n_probes
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r4, r10 = recall(0), recall(4), recall(10)
    assert r0 <= r4 <= r10, "recall must be monotone in probe count"
    assert r10 > r0, "multiprobe must recover neighbours single-bucket misses"
    assert r10 >= 0.3, f"recall@5 with 10 probes too low: {r10}"


def test_connected_components_transitive_chain(spark):
    """Pairs chain: A~B, B~C, C~D (A never directly paired with D) must
    collapse into ONE component labeled min(A..D); disconnected pairs and
    isolated structure stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    got = {r.node: r.component_id for r in dd.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_path_converges(spark):
    """A 30-node path graph needs ~diameter rounds of propagation — the
    loop must converge (and localCheckpoint must keep the plan flat),
    with convergence-count actions bounded to ceil(rounds/check_every)
    (driver-action cadence at 10^11 edges) and no leaked checkpoint
    blocks beyond the returned labels."""
    sc = spark.sparkContext
    before_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    stats: dict = {}
    got = dd.connected_components(pairs, check_every=3, stats=stats).toPandas()
    assert (got.component_id == 0).all()
    assert len(got) == 31
    assert stats["convergence_checks"] <= -(-stats["rounds"] // 3)
    # every intermediate checkpoint freed; only the final labels remain
    leaked = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before_ids
    assert len(leaked) <= 1, f"leaked checkpoint blocks: {leaked}"


def test_connected_components_budget_exhaust_raises(spark):
    """An unconverged round budget must raise, not return unverified
    labels (a 10-node path cannot converge in 2 rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        dd.connected_components(pairs, max_iter=2, check_every=3)


def test_star_components_match_min_label(spark):
    """Large-star/small-star contraction must produce the identical
    (node, component_id) labeling as min-label propagation on chains,
    stars, and seeded random graphs — and converge in O(log n) rounds
    where the min-label walk needs O(diameter)."""
    import random

    rng = random.Random(11)
    graphs = {
        "chain60": [(i, i + 1) for i in range(60)],
        "two_stars_bridge": [(0, i) for i in range(1, 6)]
        + [(100, 100 + i) for i in range(1, 6)] + [(5, 100)],
        "random": [
            (rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(150)
        ],
    }
    for name, pairs_py in graphs.items():
        pairs_py = [(a, b) for a, b in pairs_py if a != b] or [(0, 1)]
        pairs = spark.createDataFrame(pairs_py, "id_a long, id_b long")
        stats: dict = {}
        star = {
            (r.node, r.component_id)
            for r in dd.connected_components_star(pairs, stats=stats).collect()
        }
        ml = {
            (r.node, r.component_id)
            for r in dd.connected_components(pairs, max_iter=100).collect()
        }
        assert star == ml, f"{name}: star labels diverge from min-label"
        if name == "chain60":
            assert stats["rounds"] <= 8, (
                f"chain60 (diameter 60) took {stats['rounds']} star rounds — "
                "should contract in O(log n)"
            )


def test_exact_dedup_idempotent(spark, docs):
    dup = docs.unionByName(docs)  # every doc duplicated
    out = dd.exact_dedup(dup).toPandas()
    assert (out.n_copies == 2).all()
    assert len(out) == docs.count()


def test_multimodal_stub_gating():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"\x00" * 16)
    assert mm.fake_decode_header((1024).to_bytes(4, "big") + (768).to_bytes(4, "big")) == {
        "width": 1024,
        "height": 768,
    }


def test_multimodal_frame_sample(spark, docs):
    media = docs.limit(20).select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    frames = mm.frame_sample_stub(media, every_n=30).toPandas()
    assert (frames.frame_idx % 30 == 0).all()
    assert len(frames) > 0


def test_extract_metadata_both_vector_paths(spark):
    """The size-adaptive byte-metadata operator must agree with a plain
    Python reference on BOTH branches (segmented-reduce for small
    payloads, per-payload NumPy for media-sized) including empty
    payloads."""
    small = [b"", b"\x05", b"abc", b"\x00" * 10, bytes(range(256))]
    # mean length must clear the 4 KB adaptive threshold even with the
    # empty payload included, so this batch takes the per-payload branch
    big = [bytes([i % 256] * 9000) for i in range(3)] + [b""]
    for payloads in (small, big):
        rows = [(i, p) for i, p in enumerate(payloads)]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            r.media_id: (r.n_bytes, r.first_byte, r.last_byte, r.byte_checksum)
            for r in mm.extract_metadata(df).collect()
        }
        want = {
            i: (
                len(p),
                p[0] if p else -1,
                p[-1] if p else -1,
                sum(p) % 999983,
            )
            for i, p in enumerate(payloads)
        }
        assert got == want


def test_corpus_is_ascii(spark, docs):
    """The multimodal oracle equates DuckDB codepoints with utf-8 bytes —
    valid only while the corpus is ASCII; guard that assumption."""
    non_ascii = docs.where(F.length("text") != F.octet_length("text")).count()
    assert non_ascii == 0


def test_ivf_topk_recall_and_probe_monotonicity(spark, embs):
    """IVF ANN must (a) lift recall@5 monotonically with n_probes,
    (b) reach usable recall at the registered setting (3 probes over a
    ~stride-37 codebook), and (c) at n_probes = |codebook| degenerate to
    the exact answer restricted to candidate cells (recall 1 — every
    cell is scanned, the exact ranking is reproduced)."""
    queries = embs.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.nbr_id)
        for r in sim.cosine_topk(embs, queries, k=5).collect()
    }
    n_cells = sim.ivf_centroids(embs).count()

    def recall(n_probes):
        got = {
            (r.query_id, r.nbr_id)
            for r in sim.ivf_topk(embs, queries, k=5, n_probes=n_probes).collect()
        }
        return len(got & exact) / len(exact)

    r1, r3, rall = recall(1), recall(3), recall(n_cells)
    assert r1 <= r3 <= rall, "recall must be monotone in probes"
    assert r3 >= 0.3, f"recall@5 with 3 probes too low: {r3}"
    assert rall == 1.0, "probing every cell must reproduce the exact top-k"


def test_ivf_kmeans_codebook(spark, embs):
    """The Lloyd's-fitted codebook must (a) keep the (cell_id, _cv, _cn)
    contract so it drops into ivf_topk, (b) still satisfy the
    probe-everything == exact invariant (the codebook changes WHICH
    cells exist, never the verification math), and (c) produce a
    non-degenerate partition of the corpus."""
    queries = embs.where(F.col("vec_id") < 20)
    km = sim.ivf_centroids_kmeans(embs, iters=2)
    n_cells = km.count()
    assert n_cells > 1
    assert set(km.columns) == {"cell_id", "_cv", "_cn"}
    exact = {
        (r.query_id, r.nbr_id)
        for r in sim.cosine_topk(embs, queries, k=5).collect()
    }
    got_all = {
        (r.query_id, r.nbr_id)
        for r in sim.ivf_topk(
            embs, queries, k=5, n_probes=n_cells, centroids=km
        ).collect()
    }
    assert got_all == exact, "probing every k-means cell must be exact"
    assigned = sim._cells_for(embs, km, 1, "nbr_id", "embedding")
    sizes = assigned.groupBy("cell_id").count().toPandas()["count"]
    assert sizes.max() < embs.count(), "k-means collapsed to one cell"


def test_cosine_topk_guard_refuses_large_query_side(spark, embs):
    """Brute-force top-k must fail loudly when the query side exceeds the
    guard (a silent quadratic at scale), and pass when bypassed."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="guard_rows"):
        sim.cosine_topk(embs, embs, k=5, guard_rows=10)


def test_ivf_centroids_empty_codebook_raises(spark):
    """Non-dense ids where no id hits the stride must raise, not silently
    return an empty codebook (→ zero-row top-k)."""
    import pytest as _pytest

    rows = [(i, [float(i)] * sim.DIM) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    with _pytest.raises(ValueError, match="stride"):
        sim.ivf_centroids(df, stride=37)


def test_ivf_prunes_candidate_space(spark, embs):
    """The inverted-list design must bound per-query work to the probed
    cells: candidates scored per query ≪ corpus size."""
    queries = embs.where(F.col("vec_id") < 20)
    cents = sim.ivf_centroids(embs)
    assigned = sim._cells_for(embs, cents, 1, "nbr_id", "embedding")
    cell_sizes = assigned.groupBy("cell_id").count().toPandas()["count"]
    n = embs.count()
    # 3 probes → worst case 3 × max cell; must stay well under the corpus
    assert 3 * cell_sizes.max() < n * 0.6, (
        f"cells too coarse: max={cell_sizes.max()} of {n}"
    )


def test_curation_pipeline_stage_invariants(spark, docs):
    """The composed curation pipeline must (a) be a strict filter chain —
    every output doc passes the quality/lang gates, is its exact-dup
    keep-min AND its near-dup cluster minimum, and sits under its
    stratum's sample rate; (b) be value-deterministic — the same set
    regardless of input partitioning."""
    from pyspark.sql import functions as F

    from saber_spark.operators.curation import curate_corpus
    from saber_spark.operators import textops as txo

    out = curate_corpus(docs).toPandas()
    n_docs = docs.count()
    assert 0 < len(out) < n_docs, "must keep a strict, non-empty subset"

    # (a) gates hold on every surviving row
    assert (out.quality >= 0.75).all()
    assert (out.predicted_lang == "en").all()
    src_num = out.stratum.str.extract(r"(\d+)")[0].astype(int)
    rate = src_num.mod(2).map({0: 800, 1: 400})
    assert (out.bucket < rate).all()

    # near-dup canonicality: no two survivors within hamming<=3
    surv = docs.join(
        spark.createDataFrame(out[["doc_id"]]), "doc_id", "left_semi"
    )
    dup_pairs = dd.simhash_pairs(surv, max_hamming=3).count()
    assert dup_pairs == 0, "survivors must contain no near-dup pair"

    # exact-dup canonicality: all surviving normalized texts distinct
    n_distinct = surv.select(F.md5(txo.normalize_text("text"))).distinct().count()
    assert n_distinct == surv.count()

    # (b) partitioning-independence
    out2 = curate_corpus(docs.repartition(7, "text")).toPandas()
    assert set(out.doc_id) == set(out2.doc_id)


def test_redact_pii_scrubs_and_preserves(spark):
    """Every PII shape is replaced by its typed token; clean text passes
    through byte-identical; redaction is idempotent."""
    from saber_spark.operators.textops import redact_pii

    rows = [
        ("email", "contact me at jane.doe+spam@example.co.uk today", "<EMAIL>"),
        ("card", "card 4111 1111 1111 1111 expires soon", "<CARD>"),
        ("ssn", "ssn is 123-45-6789 ok", "<SSN>"),
        ("phone", "call +1 (555) 123-4567 now", "<PHONE>"),
        ("ip", "server at 192.168.10.254 responded", "<IP>"),
        ("clean", "the quick brown fox jumps over 3 lazy dogs", None),
    ]
    df = spark.createDataFrame(rows, "kind string, text string, token string")
    out = {
        r.kind: r.red
        for r in df.select(
            "kind", "text", redact_pii("text").alias("red")
        ).collect()
    }
    for kind, text, token in rows:
        if token is None:
            assert out[kind] == text
        else:
            assert token in out[kind], (kind, out[kind])
            assert not any(ch.isdigit() for ch in out[kind].replace(token, "")), (
                kind,
                out[kind],
            )
    # idempotent: redacting redacted text changes nothing
    red = df.select(redact_pii("text").alias("text"))
    again = {r.t for r in red.select(redact_pii("text").alias("t")).collect()}
    assert again == {r.text for r in red.collect()}


def test_decontaminate_flags_shingle_overlap(spark):
    """A corpus doc is contaminated iff it shares a 3-word shingle with
    the benchmark set; short docs (<3 words) match on the whole text."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps"), (101, "hi")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "a quick brown fox sleeps"),      # shares "quick brown fox"
            (2, "totally unrelated text here"),   # clean
            (3, "hi"),                            # whole-text shingle match
            (4, "hi there friend"),               # "hi there friend" != "hi"
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.contaminated
        for r in dd.decontaminate(corpus, bench).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: False}


def test_decontaminate_broadcasts_benchmark_probe(spark, docs):
    """The benchmark shingle probe must be a broadcast hash join — the
    100-TB corpus is never shuffled to meet a tiny eval set."""
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    plan = (
        dd.decontaminate(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_packed_bit_parity_with_wide(spark, docs):
    """The packed 3-counters-per-long aggregation (20 buffers + count)
    must produce bit-identical signatures to the textbook one-sum-per-bit
    form (60 buffers) — the {0,2} vote encoding makes counter>n exactly
    vote_sum>0, all in integer arithmetic."""
    wide = dd.simhash(docs, method="wide").withColumnRenamed("simhash", "w")
    packed = dd.simhash(docs, method="packed").withColumnRenamed("simhash", "p")
    joined = wide.join(packed, "doc_id")
    assert joined.where(F.col("w") != F.col("p")).count() == 0
    assert joined.count() == docs.select("doc_id").distinct().count()


def test_multimodal_resize_and_features_compose_with_ann(spark, docs):
    """resize_stub thins payloads by the stride factor; extract_features
    emits the exact embedding shape the ANN layer consumes — media
    near-dup as extract_features -> cosine, with identical payloads at
    cosine 1 and disjoint-alphabet payloads clearly separated."""
    media = docs.limit(12).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    resized = mm.resize_stub(media, factor=4).toPandas()
    orig = {r.media_id: len(r.payload) for r in media.collect()}
    assert set(resized.media_id) == set(orig)
    for _, r in resized.iterrows():
        assert r.n_bytes == len(r.payload) == -(-orig[r.media_id] // 4)
    with pytest.raises(ValueError):
        mm.resize_stub(media, factor=0)

    feats = mm.extract_features(media, dim=16)
    pdf = feats.toPandas()
    assert all(len(v) == 16 for v in pdf.embedding)
    norms = [sum(x * x for x in v) for v in pdf.embedding]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)
    # determinism: same seed, same vectors
    pdf2 = mm.extract_features(media, dim=16).toPandas()
    a = {r.media_id: tuple(r.embedding) for _, r in pdf.iterrows()}
    b = {r.media_id: tuple(r.embedding) for _, r in pdf2.iterrows()}
    assert a == b
    # composes with the ANN operator surface, byte-content-sensitively:
    # identical payloads -> cosine ~1; disjoint byte alphabets -> lower
    from saber_spark.operators.similarity import cosine_pairs

    probe = spark.createDataFrame(
        [(1, b"aaaabbbb" * 64), (2, b"aaaabbbb" * 64), (3, b"\xf0\xf1" * 256)],
        "media_id long, payload binary",
    )
    pv = cosine_pairs(
        mm.extract_features(probe).withColumnRenamed("media_id", "vec_id"),
        threshold=-1.0,
    ).toPandas()
    sim = {
        tuple(sorted((r.id_a, r.id_b))): r.cosine for _, r in pv.iterrows()
    }
    assert sim[(1, 2)] > 0.999
    assert sim[(1, 3)] < sim[(1, 2)] - 0.1


# --------------------------------------------------------------------------
# duplicate_ngram_spans / remove_duplicate_spans (Lee et al. 2021 style)
# --------------------------------------------------------------------------

# 8 tokens — shorter than the n=10 window, so pure-boilerplate overlap
# alone can never form a duplicated 10-gram in these fixtures
_BOILER = "terms of service apply to all site content"


@pytest.fixture(scope="module")
def span_corpus(spark):
    """Three docs sharing one exact 10-token passage, one unique doc,
    plus boilerplate shared by all four."""
    shared = "the quick brown fox jumps over the lazy sleeping dog"
    rows = [
        (1, f"alpha beta {shared} gamma delta {_BOILER}"),
        (2, f"{shared} epsilon zeta {_BOILER}"),
        (3, f"one two three four {shared}"),
        (4, f"totally unique words nothing repeats here at all {_BOILER}"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicate_spans_finds_the_shared_passage(spark, span_corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dd.duplicate_ngram_spans(span_corpus, n=10).collect()
    }
    # the 10-token shared passage starts at token 2 / 0 / 4; doc 4 has
    # no 10-token run shared with anyone
    assert (1, 2, 12) in spans
    assert (2, 0, 10) in spans
    assert (3, 4, 14) in spans
    assert not any(d == 4 for d, *_ in spans)


def test_adjacent_and_overlapping_windows_merge_into_one_span(spark):
    """An 11-token shared run yields two overlapping 10-gram hits
    (pos p and p+1) — they must merge into ONE [p, p+11) span."""
    run = "a b c d e f g h i j k"
    df = spark.createDataFrame(
        [(1, f"x y {run} z"), (2, f"{run} q r s")],
        "doc_id bigint, text string",
    )
    spans = dd.duplicate_ngram_spans(df, n=10).collect()
    by_doc = {r.doc_id: (r.span_start, r.span_end, r.n_dup_grams) for r in spans}
    assert len(spans) == 2
    assert by_doc[1] == (2, 13, 2)
    assert by_doc[2] == (0, 11, 2)


def test_max_docs_cap_guards_boilerplate(spark):
    """With the boilerplate guard at max_docs=2, a run shared by 3 docs
    (the "boilerplate") drops out while a run shared by exactly 2 docs
    survives — the posting-list stop-gram discipline applied to
    substring dedup."""
    boiler = "a b c d e f g h i j"   # 10 tokens, in ALL THREE docs
    pair = "p q r s t u v w x y"     # 10 tokens, in docs 1-2 only
    df = spark.createDataFrame(
        [
            (1, f"{boiler} one {pair}"),
            (2, f"{pair} two {boiler}"),
            (3, f"three {boiler} four"),
        ],
        "doc_id bigint, text string",
    )
    uncapped = dd.duplicate_ngram_spans(df, n=10, min_docs=2)
    assert uncapped.count() == 5  # boiler in 3 docs + pair in 2 docs
    capped = dd.duplicate_ngram_spans(df, n=10, min_docs=2, max_docs=2)
    spans = {(r.doc_id, r.span_start, r.span_end) for r in capped.collect()}
    # only the 2-doc run survives: tokens 11-21 in doc 1, 0-10 in doc 2
    assert spans == {(1, 11, 21), (2, 0, 10)}


def test_remove_duplicate_spans_reconstructs_survivor_text(spark, span_corpus):
    clean = {
        r.doc_id: r.clean_text
        for r in dd.remove_duplicate_spans(span_corpus, n=10).collect()
    }
    assert clean[1] == f"alpha beta gamma delta {_BOILER}"
    assert clean[2] == f"epsilon zeta {_BOILER}"
    assert clean[3] == "one two three four"
    assert 4 not in clean  # untouched docs are not emitted


def test_fully_covered_doc_disappears_from_clean_output(spark):
    run = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(1, run), (2, f"pre {run} post")], "doc_id bigint, text string"
    )
    clean = {r.doc_id: r.clean_text for r in dd.remove_duplicate_spans(df, n=10).collect()}
    assert clean == {2: "pre post"}
