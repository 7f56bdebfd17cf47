"""Text analysis / curation family: language id, quality and Gopher rules, BPE, BM25, DSIR, fingerprints, OOV and perplexity gates.

Split out of scale_queries.py in round 12 (VERDICT r11 #6); query
bodies and oracles preserved verbatim in their original registration
order. ``scale_queries`` merges the family registries back into the
original global order, so the driver surface is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import (
    dedup,
    graph,
    multimodal,
    privacy,
    sampling,
    similarity,
    ssjoin,
    textstats,
)
from ..operators.hashing import (
    MERSENNE_P,
    affine_hash_sql,
    md5_long,
    md5_long_sql,
    minhash_coeffs,
)
from ..plans.schemas import load
from ._fixtures import FixtureMemo
from .scale_common import (
    _BM25_TERMS,
    _QUALITY_F_CTE,
    _QUALITY_SCORE_SQL,
    _ROLL_H,
    _bm25_sql,
    _bpe_encode_sql,
    _bpe_sql,
    _nb_sql,
)

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


# ------------------------------------------------------------- text: lang
@_q(
    "txt_lang_id",
    r"""SELECT pred_lang, count(*) AS cnt FROM (
         SELECT CASE
           WHEN len(regexp_extract_all(text, '\b(the|and|of|to|data)\b')) > 0
            AND len(regexp_extract_all(text, '\b(the|and|of|to|data)\b'))
                >= len(regexp_extract_all(text, '\b(el|la|los|las|de)\b'))
            AND len(regexp_extract_all(text, '\b(the|and|of|to|data)\b'))
                >= len(regexp_extract_all(text, '\b(le|la|les|des|une)\b'))
           THEN 'en'
           WHEN len(regexp_extract_all(text, '\b(el|la|los|las|de)\b')) > 0
            AND len(regexp_extract_all(text, '\b(el|la|los|las|de)\b'))
                >= len(regexp_extract_all(text, '\b(le|la|les|des|une)\b'))
           THEN 'es'
           WHEN len(regexp_extract_all(text, '\b(le|la|les|des|une)\b')) > 0
           THEN 'fr'
           ELSE 'unknown' END AS pred_lang
         FROM documents) t
       GROUP BY pred_lang""",
)
def txt_lang_id(spark, sf_dir):
    """Marker-word language ID (argmax with code-order tie-break)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(textstats.predict_lang(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------- text: quality
@_q(
    "txt_quality",
    r"""SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')) AS BIGINT) AS n_words,
              round(len(regexp_extract_all(text, '\b(the|a|an|and|or|of|to|in|is|it)\b'))
                    / greatest(len(list_filter(string_split_regex(text, '\s+'),
                                               x -> x <> '')), 1), 4) AS stop_ratio,
              round(len(regexp_extract_all(text, '[^\w\s]'))
                    / greatest(length(text), 1), 4) AS punct_ratio
       FROM documents""",
)
def txt_quality(spark, sf_dir):
    """Quality features: length, word count, stopword & punctuation
    ratios (the standard pre-training heuristics)."""
    d = load(spark, sf_dir, "documents")
    f = textstats.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_words"].alias("n_words"),
        f["stop_ratio"].alias("stop_ratio"),
        f["punct_ratio"].alias("punct_ratio"),
    )


# ------------------------------------------------------- text: token count
@_q(
    "txt_token_counts",
    r"""SELECT doc_id,
              CAST(len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')) AS BIGINT) AS n_tokens_ws,
              CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe
       FROM documents""",
)
def txt_token_counts(spark, sf_dir):
    """Whitespace token count + BPE-ish estimate (ceil(chars/4))."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textstats.word_count(F.col("text")).alias("n_tokens_ws"),
        textstats.bpe_token_estimate(F.col("text")).alias("n_tokens_bpe"),
    )


@_q(
    "txt_fingerprint",
    rf"""SELECT doc_id,
              md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5,
              list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(
                    list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                    x -> {_ROLL_H})),
                (a, b) -> (a * 31 + b) % {MERSENNE_P}) AS fp_rolling
       FROM documents""",
)
def txt_fingerprint(spark, sf_dir):
    """Document fingerprints: canonical-form md5 (formatting-robust
    exact dup) + order-sensitive polynomial rolling hash over token
    hashes."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textstats.canonical_fingerprint(F.col("text")).alias("fp_md5"),
        textstats.rolling_fingerprint(F.col("text")).alias("fp_rolling"),
    )


# ------------------------------------------------------- text: tf-idf
@_q(
    "txt_tfidf",
    r"""WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf
              FROM tok GROUP BY doc_id, term),
       dfreq AS (SELECT term, count(DISTINCT doc_id) AS df
                 FROM tok GROUP BY term),
       n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
       SELECT tf.doc_id, tf.term,
              CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.df AS BIGINT) AS df,
              round(tf.tf * ln(n.n / dfreq.df), 4) AS tfidf
       FROM tf JOIN dfreq USING (term), n""",
)
def txt_tfidf(spark, sf_dir):
    """TF-IDF per (document, term): two hash aggregates over the token
    relation + a join on term; N broadcasts as a scalar. The raw-count
    tf and ln(N/df) idf keep the math identical across engines."""
    d = load(spark, sf_dir, "documents")
    return textstats.tf_idf(d, "doc_id", "text")


@_q(
    "txt_top_bigrams",
    r"""WITH w AS (SELECT list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS w
                  FROM documents),
       g AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1])) AS ngram
             FROM w WHERE len(w) >= 2)
       SELECT ngram, count(*) AS cnt FROM g GROUP BY ngram
       ORDER BY cnt DESC, ngram LIMIT 20""",
)
def txt_top_bigrams(spark, sf_dir):
    """Global top-20 word bigrams (corpus phrase statistics): sliding
    n-gram expansion, one aggregate, bounded top-k."""
    d = load(spark, sf_dir, "documents")
    return textstats.top_ngrams(d, "doc_id", "text", n=2, k=20)


@_q(
    "txt_quality_filter",
    f"""WITH f AS ({_QUALITY_F_CTE.format(src="documents")})
       SELECT doc_id, {_QUALITY_SCORE_SQL} AS quality
       FROM f
       WHERE {_QUALITY_SCORE_SQL} >= 0.7""",
)
def txt_quality_filter(spark, sf_dir):
    """Corpus quality gate: score each document with the deterministic
    heuristic (length band, stopword presence, punctuation soup) and
    keep docs above threshold — the standard pre-training filter pass,
    entirely in whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    q = textstats.quality_score(F.col("text"))
    return d.select("doc_id", q.alias("quality")).filter(
        F.col("quality") >= 0.7
    )


@_q(
    "txt_gopher_rules",
    """WITH t AS (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x <> '') AS w
                  FROM documents),
       s AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                    round(list_sum(list_transform(w,
                          x -> CAST(length(x) AS DOUBLE))) / len(w), 4)
                        AS mean_word_len,
                    round(len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 4)
                        AS ttr
             FROM t WHERE len(w) >= 1),
       e AS (SELECT doc_id, unnest(w) AS term FROM t),
       c AS (SELECT doc_id, max(cnt) AS top_cnt
             FROM (SELECT doc_id, term, count(*) AS cnt
                   FROM e GROUP BY doc_id, term)
             GROUP BY doc_id)
       SELECT s.doc_id, s.n_words, s.mean_word_len, s.ttr,
              round(c.top_cnt / CAST(s.n_words AS DOUBLE), 4)
                  AS top_word_frac,
              (s.n_words BETWEEN 10 AND 100000
               AND s.mean_word_len BETWEEN 2.0 AND 10.0
               AND s.ttr >= 0.2
               AND round(c.top_cnt / CAST(s.n_words AS DOUBLE), 4) <= 0.2)
                  AS passes
       FROM s JOIN c USING (doc_id)""",
)
def txt_gopher_rules(spark, sf_dir):
    """Gopher-style quality rules per document: word-count bounds,
    mean-word-length bounds, type-token-ratio floor, most-common-word
    share cap, and the combined pass/fail verdict
    (operators/textstats.gopher_quality)."""
    docs = load(spark, sf_dir, "documents")
    return textstats.gopher_quality(docs, "doc_id", "text")


@_q(
    "txt_repetition_rules",
    """WITH t AS (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS w
         FROM documents),
  base AS (SELECT doc_id,
                  CAST(length(array_to_string(w, ' ')) AS BIGINT)
                      AS total_chars
           FROM t WHERE len(w) >= 1),
  g AS (SELECT doc_id, n,
               unnest(list_transform(
                   generate_series(1, len(w) - n + 1),
                   i -> array_to_string(w[i:i+n-1], ' '))) AS gram
        FROM t, (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) ns(n)
        WHERE len(w) >= n),
  c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g
        GROUP BY doc_id, n, gram),
  m AS (SELECT doc_id, n,
               max(cnt * length(gram)) AS top_mass,
               sum(CASE WHEN cnt > 1 THEN cnt * length(gram)
                        ELSE 0 END) AS dup_mass
        FROM c GROUP BY doc_id, n),
  p AS (SELECT b.doc_id, b.total_chars,
               coalesce(max(CASE WHEN n=2 THEN top_mass END), 0) AS t2,
               coalesce(max(CASE WHEN n=3 THEN top_mass END), 0) AS t3,
               coalesce(max(CASE WHEN n=4 THEN top_mass END), 0) AS t4,
               coalesce(max(CASE WHEN n=5 THEN dup_mass END), 0) AS d5,
               coalesce(max(CASE WHEN n=6 THEN dup_mass END), 0) AS d6,
               coalesce(max(CASE WHEN n=7 THEN dup_mass END), 0) AS d7,
               coalesce(max(CASE WHEN n=8 THEN dup_mass END), 0) AS d8,
               coalesce(max(CASE WHEN n=9 THEN dup_mass END), 0) AS d9,
               coalesce(max(CASE WHEN n=10 THEN dup_mass END), 0)
                   AS d10
        FROM base b LEFT JOIN m USING (doc_id)
        GROUP BY b.doc_id, b.total_chars)
  SELECT doc_id,
         CAST(floor(1000000 * t2 / total_chars) AS BIGINT)
             AS top_2gram_fp,
         CAST(floor(1000000 * t3 / total_chars) AS BIGINT)
             AS top_3gram_fp,
         CAST(floor(1000000 * t4 / total_chars) AS BIGINT)
             AS top_4gram_fp,
         CAST(floor(1000000 * d5 / total_chars) AS BIGINT)
             AS dup_5gram_fp,
         CAST(floor(1000000 * d6 / total_chars) AS BIGINT)
             AS dup_6gram_fp,
         CAST(floor(1000000 * d7 / total_chars) AS BIGINT)
             AS dup_7gram_fp,
         CAST(floor(1000000 * d8 / total_chars) AS BIGINT)
             AS dup_8gram_fp,
         CAST(floor(1000000 * d9 / total_chars) AS BIGINT)
             AS dup_9gram_fp,
         CAST(floor(1000000 * d10 / total_chars) AS BIGINT)
             AS dup_10gram_fp,
         (floor(1000000 * t2 / total_chars) <= 200000
          AND floor(1000000 * t3 / total_chars) <= 180000
          AND floor(1000000 * t4 / total_chars) <= 160000
          AND floor(1000000 * d5 / total_chars) <= 150000
          AND floor(1000000 * d6 / total_chars) <= 140000
          AND floor(1000000 * d7 / total_chars) <= 130000
          AND floor(1000000 * d8 / total_chars) <= 120000
          AND floor(1000000 * d9 / total_chars) <= 110000
          AND floor(1000000 * d10 / total_chars) <= 100000) AS passes
  FROM p""",
)
def txt_repetition_rules(spark, sf_dir):
    """Gopher/MassiveText n-gram repetition rules — the other half of
    the Rae et al. Table A1 suite next to txt_gopher_rules: per-doc
    fp6 character mass of the most frequent 2/3/4-gram and of all
    duplicated 5..10-grams, with the thresholded pass verdict
    (operators/textstats.repetition_rules). One generator projection
    emits all nine n values in a single pass."""
    docs = load(spark, sf_dir, "documents")
    return textstats.repetition_rules(docs, "doc_id", "text")


@_q(
    "txt_hapax_ratio",
    """WITH t AS (SELECT list_filter(string_split(text, ' '),
                             x -> x <> '') AS w
              FROM documents),
       g AS (SELECT unnest(list_transform(
                 generate_series(1, len(w) - 2),
                 i -> array_to_string(w[i:i+2], ' '))) AS gram
             FROM t WHERE len(w) >= 3),
       c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram)
       SELECT CAST(count(*) AS BIGINT) AS n_types,
              CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
              CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END),
                            0) AS BIGINT) AS n_hapax,
              CAST(CASE WHEN count(*) > 0 THEN
                   floor(1000000 * sum(CASE WHEN n = 1 THEN 1
                         ELSE 0 END) / count(*)) END AS BIGINT)
                  AS hapax_fp,
              CAST(CASE WHEN sum(n) > 0 THEN
                   floor(1000000 * count(*) / sum(n)) END AS BIGINT)
                  AS ttr_fp
       FROM c""",
)
def txt_hapax_ratio(spark, sf_dir):
    """Corpus lexical-health card over 3-gram windows
    (operators/textstats.hapax_ratio): type/token/hapax counts and
    the fp6 hapax share + type-token ratio — the Heaps'-law signals
    that collapse when a corpus saturates with duplication or
    degenerates into templates. One expansion + one gram-keyed
    aggregate + a 1-row fold."""
    docs = load(spark, sf_dir, "documents")
    return textstats.hapax_ratio(docs, "doc_id", "text", n=3)


@_q(
    "txt_oov_rate",
    """WITH e AS (SELECT doc_id,
              unnest(list_filter(string_split(text, ' '),
                     x -> x <> '')) AS term
       FROM documents),
  v AS (SELECT term FROM (SELECT term, count(*) AS c FROM e
                          GROUP BY term
                          ORDER BY c DESC, term ASC LIMIT 16) q),
  m AS (SELECT e.doc_id, v.term IS NOT NULL AS inv
        FROM e LEFT JOIN v ON e.term = v.term)
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT)
             AS n_oov,
         CAST(floor(1000000 * sum(CASE WHEN inv THEN 0 ELSE 1 END)
                    / count(*)) AS BIGINT) AS oov_fp
  FROM m GROUP BY doc_id""",
)
def txt_oov_rate(spark, sf_dir):
    """Per-document out-of-vocabulary rate against the corpus' own
    top-16 word vocabulary (operators/textstats.vocab_coverage):
    deterministic count-desc/term-asc vocabulary boundary, broadcast
    to the token relation, fp6 OOV fraction per doc — the
    tokenizer-health audit run before freezing a vocab."""
    docs = load(spark, sf_dir, "documents")
    return textstats.vocab_coverage(docs, "doc_id", "text",
                                    vocab_size=16)


@_q(
    "txt_unigram_logprob",
    """WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS term
         FROM documents),
       vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
       tot AS (SELECT sum(c) AS n_total FROM vocab)
       SELECT doc_id, count(*) AS n_tokens,
              round(avg(ln(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE))), 4)
                  AS avg_logprob
       FROM toks JOIN vocab USING (term), tot
       GROUP BY doc_id""",
)
def txt_unigram_logprob(spark, sf_dir):
    """Mean unigram log-likelihood per document under the corpus's own
    term distribution — the cheap perplexity-style quality signal
    (operators/textstats.unigram_logprob)."""
    docs = load(spark, sf_dir, "documents")
    return textstats.unigram_logprob(docs, "doc_id", "text")


@_q(
    "txt_kl_by_source",
    """WITH toks AS (
         SELECT source,
                unnest(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS term
         FROM documents),
       ps AS (SELECT source, term, count(*) AS c_st
              FROM toks GROUP BY source, term),
       st AS (SELECT source, sum(c_st) AS n_s FROM ps GROUP BY source),
       ct AS (SELECT term, sum(c_st) AS c_t FROM ps GROUP BY term),
       tot AS (SELECT sum(c_t) AS n FROM ct)
       SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
              round(sum((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                        * ln((CAST((CAST(c_st AS HUGEINT) * n) AS DOUBLE)
                              / CAST((c_t * n_s) AS DOUBLE)))),
                    4) AS kl
       FROM ps JOIN st USING (source) JOIN ct USING (term), tot
       GROUP BY source""",
)
def txt_kl_by_source(spark, sf_dir):
    """Unigram-distribution KL divergence of each source against the
    whole corpus — the distribution-shift monitor for a mixed-source
    training set (operators/textstats.kl_by_source)."""
    docs = load(spark, sf_dir, "documents")
    return textstats.kl_by_source(docs, "source", "text")


@_q(
    "txt_bigram_perplexity",
    r"""WITH t AS (
         SELECT doc_id,
                list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '') AS w
         FROM documents),
       bg AS (SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
              FROM t, LATERAL (SELECT unnest(generate_series(1,
                     len(w) - 1)) AS i) s
              WHERE len(w) >= 2),
       m AS (SELECT prev, cur, count(*) AS c FROM bg GROUP BY prev, cur),
       ctx AS (SELECT prev, sum(c) AS cc FROM m GROUP BY prev),
       v AS (SELECT count(DISTINCT cur) AS v FROM bg)
       SELECT doc_id, count(*) AS n_bigrams,
              round(avg(ln((m.c + 1)
                    / CAST(ctx.cc + v.v AS DOUBLE))), 4) AS avg_logprob,
              round(exp(-avg(ln((m.c + 1)
                    / CAST(ctx.cc + v.v AS DOUBLE)))), 4) AS ppl
       FROM bg JOIN m USING (prev, cur) JOIN ctx USING (prev), v
       GROUP BY doc_id""",
)
def txt_bigram_perplexity(spark, sf_dir):
    """CCNet-style per-document perplexity under the corpus's own
    add-1-smoothed bigram LM (textstats.bigram_logprob) — the
    perplexity quality gate one rung up from txt_unigram_logprob:
    boilerplate scores improbably LOW perplexity, token soup HIGH,
    curation keeps the middle band. Exact-integer counts make the
    model engine-identical; the only float ops are one divide + ln
    per bigram and the rounded per-doc mean."""
    docs = load(spark, sf_dir, "documents")
    return textstats.bigram_logprob(docs, "doc_id", "text")


@_q(
    "txt_chunk_windows",
    """WITH t AS (
         SELECT doc_id,
                list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '') AS w
         FROM documents),
       n AS (SELECT doc_id, w,
                    greatest(1, CAST(ceil((len(w) - 8) / 24.0) AS INT))
                        AS n_chunks
             FROM t WHERE len(w) >= 1),
       e AS (SELECT doc_id, w,
                    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
             FROM n)
       SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
              CAST(len(list_slice(w, chunk_idx * 24 + 1,
                                  chunk_idx * 24 + 32)) AS BIGINT)
                  AS chunk_n_tokens,
              array_to_string(list_slice(w, chunk_idx * 24 + 1,
                                         chunk_idx * 24 + 32), ' ')
                  AS chunk_text
       FROM e""",
)
def txt_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (32-token chunks, 8-token
    overlap) of every document — the RAG/embedding context-window
    prep (operators/textstats.chunk_documents). (doc_id, chunk_idx)
    is the stable chunk key; the oracle rebuilds identical windows
    with list_slice."""
    docs = load(spark, sf_dir, "documents")
    return textstats.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8
    )


@_q(
    "txt_pack_sequences",
    """WITH t AS (
         SELECT doc_id, doc_id % 8 AS shard,
                len(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS n_tokens
         FROM documents),
       s AS (
         SELECT *,
                CAST(floor(coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) / 256.0)
                     AS BIGINT) AS seq_idx
         FROM t WHERE n_tokens >= 1)
       SELECT shard, seq_idx, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
              min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
       FROM s GROUP BY shard, seq_idx""",
)
def txt_pack_sequences(spark, sf_dir):
    """Example packing: documents concatenated in id order within 8
    shards and split into 256-token training sequences at document
    boundaries (operators/textstats.pack_sequences). One shuffle
    total — the running-sum window and the per-sequence rollup share
    the shard partitioning."""
    docs = load(spark, sf_dir, "documents")
    return textstats.pack_sequences(
        docs, "doc_id", "text", budget=256, n_shards=8
    )


@_q(
    "txt_line_filter",
    """WITH d AS (SELECT doc_id, string_split(text, ' a ') AS lines
              FROM documents),
       k AS (SELECT doc_id, lines,
                    list_filter(lines,
                      x -> len(list_filter(string_split(x, ' '),
                               w -> w <> '')) >= 5
                       AND list_contains(string_split(x, ' '), 'the'))
                      AS kept
             FROM d)
       SELECT doc_id,
              CAST(len(lines) AS BIGINT) AS n_lines,
              CAST(len(kept) AS BIGINT) AS kept_lines,
              CAST(coalesce(list_sum(list_transform(kept,
                     x -> len(list_filter(string_split(x, ' '),
                              w -> w <> '')))), 0) AS BIGINT) AS kept_words
       FROM k""",
)
def txt_line_filter(spark, sf_dir):
    """C4-style per-line cleanup (textstats.line_filter): the corpus
    texts carry no newlines, so the token ' a ' serves as the line
    delimiter and 'the' as the must-contain token (the stand-in for
    C4's terminal-punctuation rule — both engines split on the same
    literal, so the ledger is engine-exact). Reports the per-doc
    total/kept-line/kept-word ledger; the reassembled clean_text is
    dropped here only to keep the compared surface numeric."""
    docs = load(spark, sf_dir, "documents")
    out = textstats.line_filter(
        docs, "doc_id", "text", delim=" a ", min_words=5,
        must_contain="the",
    )
    return out.select("doc_id", "n_lines", "kept_lines", "kept_words")


@_q(
    "txt_length_buckets",
    """WITH t AS (SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n
              FROM documents),
       b AS (SELECT doc_id, n,
                    CASE WHEN n <= 32 THEN 0
                         WHEN n <= 64 THEN 1
                         WHEN n <= 128 THEN 2
                         ELSE 3 END AS bucket
             FROM t)
       SELECT bucket, count(*) AS n_docs,
              CAST(sum(n) AS BIGINT) AS sum_tokens,
              CAST(max(n) AS BIGINT) AS bucket_max,
              round((count(*) * max(n) - sum(n))
                    / CAST(count(*) * max(n) AS DOUBLE), 6) AS pad_frac
       FROM b GROUP BY bucket""",
)
def txt_length_buckets(spark, sf_dir):
    """Length-bucketed batching ledger (textstats.length_buckets):
    token-length buckets at fixed boundaries with per-bucket doc/token
    mass and the padding fraction of batching each bucket to its own
    max — the padded-batching counterpart of txt_pack_sequences'
    concatenation strategy, and the number that justifies bucketing's
    extra shuffle in a training-prep pipeline."""
    docs = load(spark, sf_dir, "documents")
    return textstats.length_buckets(docs, "doc_id", "text")


@_q(
    "txt_dsir_importance",
    r"""WITH toks AS (
         SELECT doc_id, source,
                CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT)
                    % 64 AS b
         FROM (SELECT doc_id, source,
                      unnest(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '')) AS term
               FROM documents)),
       tc AS (SELECT b, count(*) AS c FROM toks
              WHERE source = 'src0' GROUP BY b),
       rc AS (SELECT b, count(*) AS c FROM toks
              WHERE source <> 'src0' GROUP BY b),
       tt AS (SELECT count(*) AS t FROM toks WHERE source = 'src0'),
       rt AS (SELECT count(*) AS r FROM toks WHERE source <> 'src0'),
       bk AS (SELECT range AS b FROM range(0, 64)),
       lr AS (SELECT bk.b,
                     ln((CAST((CAST((coalesce(tc.c, 0) + 1) AS HUGEINT)
                               * (r + 64)) AS DOUBLE)
                         / CAST((CAST((coalesce(rc.c, 0) + 1) AS HUGEINT)
                                 * (t + 64)) AS DOUBLE))) AS lr
              FROM bk LEFT JOIN tc ON tc.b = bk.b
                      LEFT JOIN rc ON rc.b = bk.b, tt, rt),
       dc AS (SELECT doc_id, b, count(*) AS c FROM toks
              WHERE source <> 'src0' GROUP BY doc_id, b)
       SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              round(sum(c * lr), 4) + 0.0 AS dsir_logweight
       FROM dc JOIN lr USING (b) GROUP BY doc_id""",
)
def txt_dsir_importance(spark, sf_dir):
    """DSIR importance weights (textstats.dsir_importance): every
    non-src0 document scored by the hashed-unigram log-likelihood
    ratio against the src0 docs as the in-domain target — the cheap
    domain-selection signal you resample by before training. The
    64-bucket hashed model is what scales: bucket counts partial-
    aggregate map-side and the log-ratio table broadcasts as 64 rows
    regardless of corpus size. Same md5 bucket hash on both engines."""
    docs = load(spark, sf_dir, "documents")
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    return textstats.dsir_importance(raw, target, "doc_id", "text")


@_q(
    "txt_pmi_collocations",
    r"""WITH w AS (SELECT list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '') AS w
                  FROM documents),
       uni AS (SELECT unnest(w) AS t FROM w),
       uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
       nu AS (SELECT sum(c) AS nu FROM uc),
       bi AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                     i -> {'w1': w[i], 'w2': w[i+1]})) AS p
              FROM w WHERE len(w) >= 2),
       bc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c_ab
              FROM bi GROUP BY p.w1, p.w2
              HAVING count(*) >= 20),
       nb AS (SELECT sum(len(w) - 1) AS nb FROM w WHERE len(w) >= 2)
       SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
              round(ln((CAST((CAST(c_ab AS HUGEINT) * nu * nu) AS DOUBLE)
                        / CAST((nb * ua.c * ub.c) AS DOUBLE))), 4)
                  + 0.0 AS pmi
       FROM bc JOIN uc ua ON ua.t = w1 JOIN uc ub ON ub.t = w2, nu, nb
       ORDER BY pmi DESC, w1, w2 LIMIT 20""",
)
def txt_pmi_collocations(spark, sf_dir):
    """Top-20 collocations by PMI over the documents corpus
    (textstats.pmi_collocations): the phrase-mining step that feeds a
    tokenizer's multiword vocabulary. PMI is one log of an exact
    integer fraction and ranking uses the rounded value with a
    lexicographic tie-break, so the top-k set and every value
    hash-match the oracle."""
    docs = load(spark, sf_dir, "documents")
    return textstats.pmi_collocations(docs, "doc_id", "text")


@_q("txt_bpe_encode", _bpe_encode_sql(6))
def txt_bpe_encode(spark, sf_dir):
    """Apply the learned BPE merge table and report per-source
    tokenization economics (textstats.bpe_encode_report): word count,
    character mass, BPE token count and chars-per-token — what a
    token budget buys from each source. Encoding is iteration-free
    (one chained literal replace per rule over the DISTINCT word-form
    table, joined back by word), so the corpus-scale cost is one
    token-stream join regardless of merge count."""
    docs = load(spark, sf_dir, "documents")
    return textstats.bpe_encode_report(docs, "source", "text", n_merges=6)


@_q("txt_bpe_merges", _bpe_sql(6))
def txt_bpe_merges(spark, sf_dir):
    """First 6 BPE merge rules learned from the documents corpus
    (textstats.bpe_merges): one corpus-scale word-count aggregate,
    then vocabulary-sized merge rounds with a 1-row argmax collect
    each — the tokenizer-training artifact, engine-exact via the
    (count DESC, pair ASC) tie-break and shared leftmost-
    nonoverlapping replace semantics."""
    docs = load(spark, sf_dir, "documents")
    return textstats.bpe_merges(docs, "text", n_merges=6)


@_q(
    "txt_char_entropy",
    """WITH ch AS (SELECT doc_id, substr(text, i, 1) AS ch
              FROM documents,
                   LATERAL (SELECT unnest(generate_series(1, len(text)))
                            AS i) s),
       counts AS (SELECT doc_id, ch, count(*) AS c
                  FROM ch GROUP BY doc_id, ch),
       per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
                      sum(c * ln(c)) AS clogc
               FROM counts GROUP BY doc_id)
       SELECT doc_id, n_chars,
              round(ln(n_chars) - clogc / n_chars, 4) + 0.0
                  AS entropy_nats,
              (round(ln(n_chars) - clogc / n_chars, 4) + 0.0) < 2.5
                  AS low_entropy
       FROM per""",
)
def txt_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per document
    (textstats.char_entropy) — the degenerate-content tripwire run
    before any model-based quality scoring: mono-character runs,
    base64 walls and template spam sit far outside natural text's
    entropy band. Every log is taken on an exact integer count
    (ln(n) - Σc·ln(c)/n form), so the only float noise is the final
    accumulation — round-4 absorbed; the low_entropy flag compares the
    ROUNDED value so both engines emit identical booleans."""
    docs = load(spark, sf_dir, "documents")
    return textstats.char_entropy(docs, "doc_id", "text")


@_q(
    "txt_html_strip",
    r"""WITH raw AS (
         SELECT doc_id,
                '<html><head><script type="x">var a=1 &amp;&amp; 2;'
                || '</script><style>p { color: red; }</style></head>'
                || '<body><h1>Doc ' || doc_id || '</h1><p>' || text
                || '</p><div>footer &amp; nav</div></body></html>'
                    AS html
         FROM documents),
       s1 AS (SELECT doc_id,
                     regexp_replace(html,
                       '(?is)<script\b[^>]*>.*?</script>', ' ', 'g') AS t
              FROM raw),
       s2 AS (SELECT doc_id,
                     regexp_replace(t,
                       '(?is)<style\b[^>]*>.*?</style>', ' ', 'g') AS t
              FROM s1),
       s3 AS (SELECT doc_id,
                     regexp_replace(t,
                       '(?i)</(p|div|br|li|h[1-6]|tr)\s*>', chr(10),
                       'g') AS t
              FROM s2),
       s4 AS (SELECT doc_id,
                     regexp_replace(t, '<[^>]+>', ' ', 'g') AS t
              FROM s3),
       s5 AS (SELECT doc_id,
                     replace(replace(replace(replace(replace(t,
                       '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&#39;', '''') AS t
              FROM s4),
       s6 AS (SELECT doc_id,
                     regexp_replace(t, '[ \t\r\f]+', ' ', 'g') AS t
              FROM s5),
       s7 AS (SELECT doc_id,
                     regexp_replace(
                       regexp_replace(t, ' ?\n ?', chr(10), 'g'),
                       '^\s+|\s+$', '', 'g') AS t
              FROM s6)
       SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars_text,
              md5(t) AS text_hash
       FROM s7""",
)
def txt_html_strip(spark, sf_dir):
    """HTML-to-text extraction lite (textstats.strip_html) over
    documents wrapped in-query with realistic chrome (script + style
    blocks, headings, entity-encoded footer): script/style content
    dropped, block closers become newlines, tags stripped, core
    entities decoded, whitespace collapsed. Pure regexp/replace chain
    inside codegen — the declarative core of web text extraction (a
    production pipeline swaps a real extractor in via mapInPandas
    with this as the fallback); the md5 of every extracted text
    hash-matches the oracle running the identical RE2 chain."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit('<html><head><script type="x">var a=1 &amp;&amp; 2;'
              '</script><style>p { color: red; }</style></head>'
              '<body><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>footer &amp; nav</div></body></html>"),
    )
    stripped = textstats.strip_html(html)
    return docs.select(
        "doc_id",
        F.length(stripped).cast("long").alias("n_chars_text"),
        F.md5(stripped).alias("text_hash"),
    )


@_q("txt_bm25_topk", _bm25_sql())
def txt_bm25_topk(spark, sf_dir):
    """BM25 top-10 documents for a bag-of-words query
    (retrieval.bm25_topk — Robertson & Zaragoza's Okapi weighting):
    the lexical-retrieval baseline every RAG/curation stack pairs with
    its vector index. The query-term filter pushes below the tf
    aggregate (only matching postings shuffle), df and corpus stats
    broadcast, and per-term partial scores quantize to fixed point
    before the per-doc sum — exact integer addition, hash-exact
    against the oracle."""
    from ..operators import retrieval

    docs = load(spark, sf_dir, "documents")
    return retrieval.bm25_topk(
        docs, "doc_id", "text", list(_BM25_TERMS), k=10
    )


@_q("txt_nb_classifier", _nb_sql())
def txt_nb_classifier(spark, sf_dir):
    """Distributed multinomial Naive Bayes, trained AND served
    (operators/classify.py) — the fastText-style document classifier
    curation pipelines gate on (CCNet's lang/quality filters), done
    as pure aggregations: two training aggregates build the per-term
    weight table (each weight one log of an exact integer fraction,
    fixed-point), scoring is one term join + one exact integer sum
    per document. Labels here are lang='en' — the engine-portability
    point is that TRAINING, the model table, and SERVING all replay
    bit-for-bit in the oracle."""
    from ..operators import classify

    docs = load(spark, sf_dir, "documents").withColumn(
        "_y", (F.col("lang") == "en").cast("int")
    )
    w = classify.nb_train_weights(docs, "doc_id", "text", "_y")
    return classify.nb_score(docs, w, "doc_id", "text", "_y")


__all__ = [
    "txt_lang_id",
    "txt_quality",
    "txt_token_counts",
    "txt_fingerprint",
    "txt_tfidf",
    "txt_top_bigrams",
    "txt_quality_filter",
    "txt_gopher_rules",
    "txt_repetition_rules",
    "txt_hapax_ratio",
    "txt_oov_rate",
    "txt_unigram_logprob",
    "txt_kl_by_source",
    "txt_bigram_perplexity",
    "txt_chunk_windows",
    "txt_pack_sequences",
    "txt_line_filter",
    "txt_length_buckets",
    "txt_dsir_importance",
    "txt_pmi_collocations",
    "txt_bpe_encode",
    "txt_bpe_merges",
    "txt_char_entropy",
    "txt_html_strip",
    "txt_bm25_topk",
    "txt_nb_classifier",
]
