"""Similarity search over embedding columns (beyond-reference).

Approximate-nearest-neighbor over an ``array<float>`` column:

- ``cosine_topk``: brute-force exact top-k for a (small) query set —
  broadcast the queries, stream the corpus once, per-query bounded
  heap via window rank. The correctness baseline.
- ``blocked_cosine_pairs``: all-pairs cosine ≥ threshold within a
  blocking key (cluster/label/LSH bucket) — near-dup detection where
  candidate pairs are confined to blocks.
- ``lsh_topk``: random-hyperplane LSH (sign-bit signatures) bucketing
  the corpus so each query only scores its bucket — the scale path
  when the query set is itself huge.

All dot products run as JVM-side higher-order functions
(``zip_with`` + ``aggregate``) in double precision — no Python UDFs in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_long


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision via a left-fold (deterministic
    summation order — reproducible across engines)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    """Precompute L2 norms once (reused across every comparison)."""
    return df.withColumn(out, _norm(F.col(vec_col)))


def l2_normalize(df: DataFrame, vec_col: str, out: str = "unit",
                 norm_col: str = "norm") -> DataFrame:
    """Append the unit-length vector (and its norm) for ``vec_col``.

    The norm is projected into its own column FIRST and the transform
    divides by that column — embedding the aggregate inside the
    lambda would re-evaluate it per element (the HOF re-evaluation
    trap; see dedup shingles). Zero vectors map to NULL, not a
    divide-by-zero vector of NaNs."""
    normed = df.withColumn(norm_col, _norm(F.col(vec_col)))
    return normed.withColumn(
        out,
        F.when(
            F.col(norm_col) > 0.0,
            F.transform(
                F.col(vec_col),
                lambda x: x.cast("double") / F.col(norm_col),
            ),
        ),
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (the standard ANN
    index compression: 4x smaller than float32, dot products stay
    proportional): scale = max|xᵢ|/127, codeᵢ = round(xᵢ/scale).

    Pure per-row array math — no shuffle, runs inside codegen at scan
    speed over any corpus size. The abs-max is projected into its own
    column first so the fold runs once, not once per element (HOF
    re-evaluation trap). All arithmetic is in double so every engine
    derives bit-identical codes from float32 inputs; zero vectors get
    scale 0 and all-zero codes."""
    amax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    proj = df.select(F.col(id_col), F.col(vec_col), amax.alias("_amax"))
    scale = F.when(F.col("_amax") > 0.0, F.col("_amax") / F.lit(127.0))
    codes = F.when(
        F.col("_amax") > 0.0,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / (F.col("_amax") / F.lit(127.0)))
            .cast("int"),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return proj.select(
        F.col(id_col),
        F.coalesce(scale, F.lit(0.0)).alias("scale"),
        codes.alias("codes"),
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 5,
                round_digits: int = 6) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    queries is broadcast (it must be small — the brute-force regime);
    the corpus is scanned exactly once with no shuffle of the vectors;
    only (query, candidate, cosine) triples reach the per-query top-k
    window. Ranking uses the ROUNDED cosine with an id tie-break so
    results are deterministic and engine-portable.

    Self-matches (same id) are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rk").cast("long").alias("rk"))
    )


def blocked_cosine_pairs(df: DataFrame, id_col: str, vec_col: str,
                         block_col: str, threshold: float,
                         round_digits: int = 6) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) within each block.
    The equi-join on the block key bounds the pair explosion to
    Σ_block n²; blocks come from labels, clusters, or LSH buckets."""
    a = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                round_digits,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, n_centroids: int = 8,
             n_probe: int = 2, round_digits: int = 6,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus
    into centroid cells, search only the ``n_probe`` cells nearest to
    each query.

    ``centroids`` (a (cluster, centroid) table, e.g. from
    clustering.kmeans_fit) is the trained codebook; when omitted, the
    ``n_centroids`` lowest-id corpus vectors stand in — deterministic
    and oracle-friendly. Either way the table broadcasts for both
    assignment and probing, so the corpus is scanned once with no
    vector shuffle; only probed-cell candidates are scored.
    Recall < 1 by construction when n_probe < n_centroids.

    All rankings use the ROUNDED cosine with an id tie-break so
    results are deterministic and engine-portable."""
    if centroids is not None:
        cent = centroids.select(
            F.col("cluster").alias("cid"),
            F.col("centroid").alias("_ctv"),
            _norm(F.col("centroid")).alias("_ctn"),
        )
    else:
        cent = (
            corpus.orderBy(id_col).limit(n_centroids)
            .select(
                F.col(id_col).alias("cid"),
                F.col(vec_col).alias("_ctv"),
                _norm(F.col(vec_col)).alias("_ctn"),
            )
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    asg_w = Window.partitionBy("neighbor_id").orderBy(
        F.desc("_ccos"), F.asc("cid")
    )
    cells = (
        c.crossJoin(F.broadcast(cent))
        .withColumn(
            "_ccos",
            F.round(
                _dot(F.col("_cv"), F.col("_ctv"))
                / (F.col("_cn") * F.col("_ctn")),
                round_digits,
            ),
        )
        .withColumn("_rk", F.row_number().over(asg_w))
        .filter(F.col("_rk") == 1)
        .select("neighbor_id", "_cv", "_cn", "cid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("_qcos"), F.asc("cid")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "_qcos",
            F.round(
                _dot(F.col("_qv"), F.col("_ctv"))
                / (F.col("_qn") * F.col("_ctn")),
                round_digits,
            ),
        )
        .withColumn("_rk", F.row_number().over(probe_w))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "_qn", "cid")
    )
    scored = (
        cells.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rk").cast("long").alias("rk"))
    )


def _plane_sign(p: int, i: int) -> float:
    """±1 component of pseudo-random hyperplane p at dim i, derived
    from md5 of a fixed string — computed driver-side (it's a pure
    constant) so the plan carries literals, not 64×planes hash calls."""
    import hashlib

    h = int(hashlib.md5(f"plane:{p}:{i}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


def hyperplane_signature(vec: Column, dim: int, planes: int = 8) -> Column:
    """Random-hyperplane LSH signature (Charikar 2002): bit p is the
    sign of <v, r_p> with deterministic ±1 hyperplane components.
    Cosine-similar vectors agree on most bits."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        # zip_with against a literal ±1 array: one vectorized
        # expression per plane instead of dim scalar terms
        r = F.array(*[F.lit(_plane_sign(p, i)) for i in range(dim)])
        dot = F.aggregate(
            F.zip_with(vec, r, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, dim: int, k: int = 5, planes: int = 8,
             round_digits: int = 6, multiprobe: int = 0) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane
    signature, score only within matching buckets. Recall < 1 by
    construction (a neighbor in a different bucket is missed). This is
    the path when |queries| is too large to broadcast-score the whole
    corpus.

    ``multiprobe=m`` additionally probes every bucket at Hamming
    distance 1 on the first m planes (the standard recall/cost dial:
    m extra buckets per query, no extra corpus passes — queries are
    expanded, the corpus side is untouched)."""
    sig = hyperplane_signature(F.col(vec_col), dim, planes)
    probe_sigs = F.array(
        sig, *[sig.bitwiseXOR(F.lit(1 << p)) for p in range(multiprobe)]
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
        F.explode(probe_sigs).alias("_sig"),
    )
    cs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
        hyperplane_signature(F.col(vec_col), dim, planes).alias("_sig"),
    )
    scored = (
        cs.join(qs, "_sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rk").cast("long").alias("rk"))
    )


def semantic_prune(df: DataFrame, id_col: str, vec_col: str,
                   k: int = 8, iters: int = 2, threshold: float = 0.4,
                   round_digits: int = 6) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al.,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", 2023): cluster the corpus with the deterministic
    k-means, then within each cluster drop every vector that has a
    LOWER-ID neighbor at cosine >= threshold. Returns one row per
    input vector: (id, cluster, keep).

    The drop rule is "dominated by any lower id", not the paper's
    sequential greedy sweep: it is order-free (one join, no
    iteration), deterministic, and strictly more aggressive — if B
    duplicates A and C duplicates B, both B and C go (the greedy
    sweep would re-admit C when C~A is below threshold). For corpus
    curation that bias is the safe direction.

    Scale shape: k-means is the existing broadcast-argmin loop;
    within-cluster pairing is Sigma_cluster n^2, so k must scale with
    the corpus (target 1-10K vectors per cluster at 100 TB — SemDeDup
    itself runs ~100K clusters for web scale). Everything downstream
    of the centroid fit is two shuffles: one cluster-keyed pair join,
    one left join for the keep flag."""
    from .clustering import assign_clusters, kmeans_fit

    cents = kmeans_fit(df, id_col, vec_col, k=k, iters=iters,
                       round_digits=round_digits)
    assigned = assign_clusters(df, cents, id_col, vec_col,
                               round_digits).localCheckpoint()
    pairs = blocked_cosine_pairs(
        assigned, id_col, vec_col, "cluster", threshold, round_digits
    )
    dropped = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(F.col("_drop"), F.lit(False)).alias("_d"),
        )
        .select(id_col, "cluster", (~F.col("_d")).alias("keep"))
    )


def standardize_dims(df: DataFrame, id_col: str, vec_col: str,
                     scale: int = 10 ** 6,
                     round_digits: int = 4) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column —
    the whitening-lite preprocessing step before distance-based
    curation (k-means, cosine pruning) when dimensions have uneven
    variance.

    Engine-exact by the same trick as linalg.gram_matrix: values are
    quantized to integer ``scale``-ths first, the per-dimension
    sum / sum-of-squares / count aggregate over EXACT integers (the
    z-score is scale-invariant, so quantization only perturbs at
    1/scale), and the float math happens once per output value from
    identical integer operands with an identical expression tree —
    so the rounded z-scores hash-match any engine.

    Shape: one posexplode + one 64-key aggregate, then the d-row
    stats table broadcast back onto the exploded rows. Nothing
    row-scaled shuffles except the (id, dim, q) explosion itself,
    which is the output's own cardinality. Returns (id, dim [1-based],
    z) with constant dimensions yielding NULL z."""
    e = df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("_p", "_x"),
    ).select(
        F.col(id_col),
        (F.col("_p") + 1).alias("dim"),
        F.floor(F.col("_x").cast("double") * scale).cast("long").alias("_q"),
    )
    s = e.groupBy("dim").agg(
        F.sum("_q").cast("double").alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).cast("double").alias("_ss"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    )
    mean = F.col("_s") / F.col("_n")
    var = F.col("_ss") / F.col("_n") - mean * mean
    return (
        e.join(F.broadcast(s), "dim")
        .select(
            F.col(id_col),
            F.col("dim").cast("int").alias("dim"),
            F.when(
                var > 0.0,
                # + 0.0 collapses IEEE -0.0 (a value that rounds to
                # zero from below) onto +0.0 so every engine and hash
                # normalization agrees on the textual form
                F.round((F.col("_q") - mean) / F.sqrt(var), round_digits)
                + F.lit(0.0),
            ).alias("z"),
        )
    )


def pq_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
            vec_col: str, k: int = 5, m: int = 8, sub_d: int = 8,
            k_star: int = 8, round_digits: int = 6) -> DataFrame:
    """Product-quantization ANN (Jégou et al., "Product quantization
    for nearest neighbor search", TPAMI'11): split each vector into
    ``m`` subspaces, quantize each sub-vector to its nearest codebook
    centroid, and score queries against the CODES via asymmetric
    distance computation (ADC) — per query, one m x k* lookup table
    replaces all float math against the corpus.

    Why it matters at 100 TB: the corpus representation shrinks from
    d floats to m small codes (here 64x4B -> 8 codes, ~32x less
    memory traffic), which is what makes exhaustive re-ranking of
    billions of vectors feasible; compose with the IVF cells
    (ivf_topk) for the standard IVF-PQ pipeline. Codebooks here come
    from the deterministic seed (first k* ids' sub-vectors, rounded)
    — swap in clustering.kmeans_fit per subspace for trained
    codebooks; the quantize/ADC contract is identical and the
    training path is oracle-proven by ml_kmeans_centroids.

    Engine-exact: assignments argmin on (rounded distance, centroid
    id); ADC entries are INTEGER micro-distances
    (floor(round(d,6)*1e6 + .5)), so per-pair sums are exact and the
    ranking (adc ASC, neighbor ASC) is deterministic on any engine.
    Returns (query_id, neighbor_id, adc_dist, rk)."""
    from .clustering import _sqdist

    def sub(col):  # 1-based slice of subspace s
        return lambda s: F.slice(col, s * sub_d + 1, sub_d)

    corpus_sub = sub(F.col(vec_col))
    parts_codes = []
    parts_qt = []
    for s in range(m):
        cb = (
            corpus.orderBy(id_col)
            .limit(k_star)
            .select(
                F.col(id_col).cast("long").alias("_cid"),
                F.transform(
                    corpus_sub(s),
                    lambda x: F.round(x.cast("double"), round_digits),
                ).alias("_cv"),
            )
        )
        w = Window.partitionBy("_id").orderBy(F.asc("_dist"), F.asc("_cid"))
        codes_s = (
            corpus.select(
                F.col(id_col).alias("_id"), corpus_sub(s).alias("_sv")
            )
            .crossJoin(F.broadcast(cb))
            .withColumn(
                "_dist",
                F.round(_sqdist(F.col("_sv"), F.col("_cv")), round_digits),
            )
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(
                F.col("_id"), F.lit(s).alias("_s"),
                F.col("_cid").alias("_code"),
            )
        )
        parts_codes.append(codes_s)
        qt_s = (
            queries.select(
                F.col(id_col).alias("_qid"), corpus_sub(s).alias("_qv")
            )
            .crossJoin(F.broadcast(cb))
            .select(
                "_qid", F.lit(s).alias("_s"), F.col("_cid").alias("_code"),
                F.floor(
                    F.round(
                        _sqdist(F.col("_qv"), F.col("_cv")), round_digits
                    ) * 1_000_000 + F.lit(0.5)
                ).cast("long").alias("_d"),
            )
        )
        parts_qt.append(qt_s)
    codes = parts_codes[0]
    for p in parts_codes[1:]:
        codes = codes.unionByName(p)
    qt = parts_qt[0]
    for p in parts_qt[1:]:
        qt = qt.unionByName(p)
    scored = (
        codes.join(F.broadcast(qt), ["_s", "_code"])
        .filter(F.col("_id") != F.col("_qid"))
        .groupBy("_qid", "_id")
        .agg(F.sum("_d").alias("adc_dist"))
    )
    wq = Window.partitionBy("_qid").orderBy(F.asc("adc_dist"), F.asc("_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_id").alias("neighbor_id"),
            F.col("adc_dist").cast("long").alias("adc_dist"),
            "rk",
        )
    )


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
               vec_col: str, k: int = 5, n_cells: int = 8,
               n_probe: int = 2, m: int = 8, sub_d: int = 8,
               k_star: int = 8, round_digits: int = 6) -> DataFrame:
    """IVF-PQ — the standard billion-scale ANN pipeline (Jégou et al.
    TPAMI'11 §IV): a coarse quantizer partitions the corpus into
    cells, each vector stores only its cell id + m PQ codes of its
    RESIDUAL (x − cell centroid), and a query scores just the
    ``n_probe`` nearest cells through per-cell integer ADC tables.
    Search cost ∝ probed fraction; memory ∝ m bytes/vector — the two
    levers that make 10^9+ corpora searchable.

    All the determinism conventions of ivf_topk/pq_topk compose
    unchanged: L2 everywhere, argmin on (rounded distance, id),
    integer micro-distance ADC sums, (adc ASC, id ASC) ranking —
    engine-exact end to end. Codebooks are deterministic seeds
    (coarse: first n_cells vectors; PQ: first k_star residuals);
    kmeans_fit slots into either role for trained quantizers.
    Returns (query_id, neighbor_id, adc_dist, rk)."""
    from .clustering import _sqdist

    def rounded(col):
        return F.transform(
            col, lambda x: F.round(x.cast("double"), round_digits)
        )

    cells = (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).cast("long").alias("_cell"),
            rounded(F.col(vec_col)).alias("_cv"),
        )
    )
    w_cell = Window.partitionBy("_id").orderBy(F.asc("_d"), F.asc("_cell"))
    asg = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .crossJoin(F.broadcast(cells))
        .withColumn(
            "_d", F.round(_sqdist(F.col("_v"), F.col("_cv")), round_digits)
        )
        .withColumn("_rk", F.row_number().over(w_cell))
        .filter(F.col("_rk") == 1)
        .select(
            "_id",
            "_cell",
            F.zip_with(
                "_v", "_cv", lambda x, y: x.cast("double") - y
            ).alias("_res"),
        )
    )
    # PQ codebooks over residual sub-vectors (seed: first k_star ids)
    def sub(col, s):
        return F.slice(col, s * sub_d + 1, sub_d)

    asg = asg.localCheckpoint()
    seeds = asg.orderBy("_id").limit(k_star)
    parts_codes, cbs = [], {}
    for s in range(m):
        cb = seeds.select(
            F.col("_id").cast("long").alias("_cid"),
            rounded(sub(F.col("_res"), s)).alias("_bv"),
        )
        cbs[s] = cb
        w = Window.partitionBy("_id").orderBy(F.asc("_d"), F.asc("_cid"))
        parts_codes.append(
            asg.select("_id", "_cell", sub(F.col("_res"), s).alias("_sv"))
            .crossJoin(F.broadcast(cb))
            .withColumn(
                "_d",
                F.round(_sqdist(F.col("_sv"), F.col("_bv")), round_digits),
            )
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(
                "_id", "_cell", F.lit(s).alias("_s"),
                F.col("_cid").alias("_code"),
            )
        )
    codes = parts_codes[0]
    for p in parts_codes[1:]:
        codes = codes.unionByName(p)
    # query side: probe cells, then per-(query, cell) residual tables
    w_probe = Window.partitionBy("_qid").orderBy(F.asc("_d"), F.asc("_cell"))
    probes = (
        queries.select(
            F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
        )
        .crossJoin(F.broadcast(cells))
        .withColumn(
            "_d", F.round(_sqdist(F.col("_qv"), F.col("_cv")), round_digits)
        )
        .withColumn("_rk", F.row_number().over(w_probe))
        .filter(F.col("_rk") <= n_probe)
        .select(
            "_qid",
            "_cell",
            F.zip_with(
                "_qv", "_cv", lambda x, y: x.cast("double") - y
            ).alias("_qres"),
        )
    )
    parts_qt = []
    for s in range(m):
        parts_qt.append(
            probes.select(
                "_qid", "_cell", sub(F.col("_qres"), s).alias("_qs")
            )
            .crossJoin(F.broadcast(cbs[s]))
            .select(
                "_qid", "_cell", F.lit(s).alias("_s"),
                F.col("_cid").alias("_code"),
                F.floor(
                    F.round(
                        _sqdist(F.col("_qs"), F.col("_bv")), round_digits
                    ) * 1_000_000 + F.lit(0.5)
                ).cast("long").alias("_d"),
            )
        )
    qt = parts_qt[0]
    for p in parts_qt[1:]:
        qt = qt.unionByName(p)
    scored = (
        codes.join(F.broadcast(qt), ["_cell", "_s", "_code"])
        .filter(F.col("_id") != F.col("_qid"))
        .groupBy("_qid", "_id")
        .agg(F.sum("_d").alias("adc_dist"))
    )
    wq = Window.partitionBy("_qid").orderBy(F.asc("adc_dist"), F.asc("_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_id").alias("neighbor_id"),
            F.col("adc_dist").cast("long").alias("adc_dist"),
            "rk",
        )
    )
