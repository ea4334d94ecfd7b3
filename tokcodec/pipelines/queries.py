"""Driver-contract query catalog: every implemented operator/pipeline as
a `name -> callable(sf_dir)` plus a DuckDB oracle SQL where the result is
SQL-expressible (see __ray_entry__.py).

Column names in each Ray result match the oracle SQL aliases exactly —
the driver's value-hash sorts columns by name before hashing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokcodec.functions import ann, dedup, multimodal, sample, text
from tokcodec.functions.sortagg import sorted_group_reduce
from tokcodec.pipelines.encode import decode_stream, encode_stream
from tokcodec.predicate import col, read_parquet_filtered
from tokcodec.scanner import scan_schema


# Row-aware read granularity for the catalog queries: Ray's default
# splits even a 5000-row file into ~2*CPUs blocks to hit its parallelism
# target, and every per-block stage (codec sampling, FSST table build,
# auto-selection trials in encode_stream) then pays its fixed setup cost
# 64 times on 78-row blocks — measured 4x on the sf0.1 roundtrip.  Keep
# at least `_RP_MIN_ROWS_PER_BLOCK` rows per block (floor 4 blocks so
# multi-block code paths — boundary stitching, partial aggregation —
# still execute in driver runs) and only override when that is FEWER
# blocks than Ray's own target: row-rich tables (lineitem at any sf,
# anything at 100 TB) disengage the heuristic and keep full shuffle
# parallelism — capping aggregate inputs at 4 blocks measurably HURT
# (group-by reduce width follows input block count).  Row count comes
# from the parquet footer (metadata-only read).
_RP_MIN_ROWS_PER_BLOCK = 2000


def _scratch_dir(tag: str, sf_dir: str) -> str:
    """Deterministic per-(query, input) scratch dir, recreated fresh on
    each call — mkdtemp here leaked a full encoded copy of the table per
    driver/verify/bench invocation (unbounded /tmp growth across
    rounds)."""
    import hashlib
    import shutil
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "tokcodec_q", f"{tag}_{key}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def _rp(sf_dir: str, table: str, **kw):
    import pyarrow.parquet as pq

    import ray
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    if "override_num_blocks" not in kw:
        try:
            rows = pq.read_metadata(path).num_rows
        except Exception:
            rows = None
        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        if rows is not None:
            want = max(4, -(-rows // _RP_MIN_ROWS_PER_BLOCK))
            if want < cpus * 2:
                kw["override_num_blocks"] = int(want)
    return ray.data.read_parquet(path, **kw)


# ------------------------------------------------------------ engine ----


def roundtrip(table: str, columns: list[str]):
    """Flagship: read → columnar encode (codec auto-selection) → decode →
    the decoded rows.  The oracle (SELECT <cols>) passes iff decode is
    value-identical — the reference's round-trip equality semantics
    (ParquetExampleTest.scala:51-55) as a driver-checked query."""

    def run(sf_dir: str):
        ds = _rp(sf_dir, table, columns=columns)
        return decode_stream(encode_stream(ds)).map_batches(
            lambda t: t.select(columns), batch_format="pyarrow"
        )

    return run


def encode_stats(table: str = "documents"):
    def run(sf_dir: str):
        ds = _rp(sf_dir, table)
        enc = encode_stream(ds)
        return enc.map_batches(
            lambda t: t.select(["rows", "n_tok", "bytes_in", "bytes_out"]),
            batch_format="pyarrow",
        )

    return run


def tokenize_roundtrip_documents(sf_dir: str):
    """The full north-rule pipeline on real testdata: tokenize documents
    into (doc_id, tokens, n_tok, source) → columnar encode → decode →
    report (doc_id, n_tok).  Oracle-checkable because the tokenizer's
    word rule matches DuckDB's regexp_extract_all, so a value-identical
    n_tok after the round trip proves the encode/decode chain."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    tok = ds.map_batches(text.tokenize, batch_format="pyarrow")
    dec = decode_stream(encode_stream(tok))
    return dec.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# -------------------------------------------------- capability surface ----


def projection_documents(sf_dir: str):
    # projection pushdown at the scan (SURVEY.md §2 #1-#3)
    return _rp(sf_dir, "documents", columns=["doc_id", "lang"])


def predicate_lineitem(sf_dir: str):
    e = (col("l_quantity") > 30.0) & (col("l_discount") <= 0.05)
    return read_parquet_filtered(
        f"{sf_dir}/lineitem.parquet",
        e,
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
    )


def predicate_or_events(sf_dir: str):
    e = (col("event_type") == "click") | (col("value") > 90.0)
    return read_parquet_filtered(
        f"{sf_dir}/events.parquet", e, columns=["event_id", "event_type", "value"]
    )


def predicate_dates_lineitem(sf_dir: str):
    import datetime

    e = col("l_shipdate") < datetime.datetime(1995, 6, 1)
    return read_parquet_filtered(
        f"{sf_dir}/lineitem.parquet",
        e,
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
    )


def predicate_isin_part(sf_dir: str):
    e = col("p_brand").isin(["Brand#1", "Brand#2"])
    return read_parquet_filtered(
        f"{sf_dir}/part.parquet", e, columns=["p_partkey", "p_brand"]
    )


def predicate_negation_orders(sf_dir: str):
    e = ~(col("o_orderstatus") == "F")
    return read_parquet_filtered(
        f"{sf_dir}/orders.parquet", e, columns=["o_orderkey", "o_orderstatus"]
    )


_DOC_FIELDS = [
    ("doc_id", "int64"),
    ("text", "bytes"),
    ("lang", "bytes"),
    ("source", "bytes"),
    ("n_chars", "int64"),
]


def predicate_tokb_roundtrip(sf_dir: str):
    """Predicate pushdown on OUR OWN format: encode lineitem into TOKB
    blocks (row-ranged partitions), then decode with a predicate — block
    headers carry per-column zone-map stats, so non-matching blocks skip
    at the header read (lineitem is orderkey-ordered, so the filter
    prunes most blocks); survivors decode + re-filter.  Oracle = the
    same WHERE in DuckDB over the source table."""

    from tokcodec.pipelines.encode import decode_dataset
    from tokcodec.sources.sink import TokbDatasink

    out = _scratch_dir("tokbpred", sf_dir)
    # sort by the filter key so block zone maps are disjoint (the layout
    # this feature exists for), split into ranged blocks, encode
    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    ds.sort("l_orderkey").repartition(8).write_datasink(TokbDatasink(out))
    return decode_dataset(out, predicate=col("l_orderkey") < 1000)


def predicate_tokb_nested(sf_dir: str):
    """Nested-path pushdown on OUR OWN format (VERDICT r2 missing #1):
    documents get a struct column meta={size, lang}, sorted by the
    nested key and encoded to TOKB; the decode filters on
    col("meta.size") — block headers carry per-CHILD zone-map stats
    keyed by dotted path, so non-matching blocks skip at the header
    read, and the projection decodes ONLY the size child subtree.
    Oracle = the same WHERE over the flat source columns."""

    from tokcodec.pipelines.encode import decode_dataset
    from tokcodec.sources.sink import TokbDatasink

    out = _scratch_dir("tokbnest", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars", "lang"])

    def to_struct(t: pa.Table) -> pa.Table:
        meta = pa.StructArray.from_arrays(
            [
                t.column("n_chars").combine_chunks(),
                t.column("lang").combine_chunks(),
            ],
            names=["size", "lang"],
        )
        return pa.table({"doc_id": t.column("doc_id"), "meta": meta})

    (
        ds.sort("n_chars")
        .map_batches(to_struct, batch_format="pyarrow")
        .repartition(8)
        .write_datasink(TokbDatasink(out))
    )
    dec = decode_dataset(
        out, columns=["doc_id", "meta.size"], predicate=col("meta.size") > 500
    )

    def flatten(t: pa.Table) -> pa.Table:
        meta = t.column("meta").combine_chunks()
        return pa.table({"doc_id": t.column("doc_id"), "size": meta.field("size")})

    return dec.map_batches(flatten, batch_format="pyarrow")


def evolution_read_documents(sf_dir: str):
    """Schema evolution as a driver-checked query (SURVEY §2 #18-#19):
    encode (doc_id, n_chars) into TOKB, then read under a WIDER schema
    that adds an optional int64 field — the absent field materializes as
    nulls (ParquetExampleTest.scala:263-326 semantics); oracle = the
    same projection with a NULL column in DuckDB."""

    from tokcodec.schema import Schema, Type
    from tokcodec.sources.reader import TokbReader
    from tokcodec.sources.sink import TokbDatasink

    out = _scratch_dir("evo", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    ds.write_datasink(TokbDatasink(out))
    read_schema = (
        Schema.Builder()
        .optional("doc_id", Type.INT64)
        .optional("n_chars", Type.INT64)
        .optional("extra", Type.INT64)
        .named("docs_v2")
    )
    return TokbReader(out).with_schema(read_schema).dataset()


def scanner_documents(sf_dir: str):
    s = scan_schema(_rp(sf_dir, "documents"))
    return pa.Table.from_pylist(
        [
            {"field": f.name, "type": f.type.value, "repetition": f.repetition.value}
            for f in s.fields
        ]
    )


def scanner_documents_oracle() -> str:
    parts = [
        f"SELECT '{name}' AS field, '{typ}' AS type, "
        f"CASE WHEN COUNT({name}) = COUNT(*) THEN 'required' ELSE 'optional' END AS repetition "
        f"FROM documents"
        for name, typ in _DOC_FIELDS
    ]
    return " UNION ALL ".join(parts)


# ------------------------------------------------------ text analysis ----


def token_count_documents(sf_dir: str):
    return _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: text.add_token_count(t).select(["doc_id", "n_words"]),
        batch_format="pyarrow",
    )


def fingerprint_documents(sf_dir: str):
    return _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: text.add_fingerprint(t).select(["doc_id", "fp"]),
        batch_format="pyarrow",
    )


def langid_documents(sf_dir: str):
    return _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        text.LangId,
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    ).map_batches(lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow")


def quality_documents(sf_dir: str):
    return _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: text.add_quality(t).select(["doc_id", "q_words"]),
        batch_format="pyarrow",
    )


def langid_documents_oracle() -> str:
    """SQL-expressed stopword vote, generated from the SAME _STOPWORDS
    tables LangId uses (so they cannot drift): word lists via
    regexp_extract_all over the lowered 2000-char prefix, per-language
    hit counts, first-strict-max tie-break in (en, de, fr, es) order,
    'unknown' on zero hits — exactly LangId's semantics."""
    from tokcodec.functions.text import _STOPWORDS

    langs = list(_STOPWORDS)  # LangId's argmax order == dict order

    def inlist(lang: str) -> str:
        return ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))

    counts = ", ".join(
        f"len(list_filter(ws, x -> x IN ({inlist(lg)}))) AS {lg}" for lg in langs
    )
    # first-strict-max in dict order: lang i wins iff >= every later lang
    whens = " ".join(
        "WHEN "
        + " AND ".join(f"{lg} >= {other}" for other in langs[i + 1 :])
        + f" THEN '{lg}'"
        for i, lg in enumerate(langs[:-1])
    )
    return (
        "WITH w AS (SELECT doc_id, regexp_extract_all("
        "substring(lower(coalesce(text, '')), 1, 2000), '[a-z]+') AS ws "
        "FROM documents), "
        f"s AS (SELECT doc_id, {counts} FROM w) "
        f"SELECT doc_id, CASE WHEN greatest({', '.join(langs)}) = 0 "
        f"THEN 'unknown' {whens} ELSE '{langs[-1]}' END AS lang_pred FROM s"
    )


def wordcount_topk_documents(sf_dir: str):
    """The canonical distributed pipeline: per-batch vectorized word
    extraction + LOCAL count (pyarrow group_by — only (word, n) partials
    cross the wire), one groupby(word) shuffle to merge, then a
    deterministic top-20 (count desc, word asc)."""
    from ray.data.aggregate import Sum

    from tokcodec.functions.text import split_words

    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        words, _doc_idx, _n = split_words(batch.column("text"))
        t = pa.table({"word": words.cast(pa.string())})
        c = t.group_by("word").aggregate([("word", "count")])
        return pa.table(
            {
                "word": c.column("word"),
                "n": c.column("word_count").cast(pa.int64()),
            }
        )

    agg = sorted_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"],
        [("n", "sum", "n")],
    )
    return agg.sort(["n", "word"], descending=[True, False]).limit(20)


def redact_documents(sf_dir: str):
    """Rule-based redaction (text TRANSFORMATION, not analysis):
    ordered RE2 global substitutions, one vectorized Arrow kernel pass
    per rule — embarrassingly parallel, no shuffle, no Python per row."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(text.redact, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "redacted"]), batch_format="pyarrow"
    )


def _redact_oracle_sql() -> str:
    expr = "text"
    for pat, rep in text.REDACT_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS redacted FROM documents"


TFIDF_TERMS = ["data", "filter", "hash", "join", "vector"]
TFIDF_K = 20


def tfidf_topk_documents(sf_dir: str):
    """Integer-exact TF-IDF retrieval (top-k docs for a fixed query):
    two-wave plan like `group_quota` — wave 1 reduces the corpus to one
    (N, df_j) summary row per batch and aggregates to O(terms) driver
    state; wave 2 recomputes tf per doc with the tiny weight table in
    the task closure, takes a per-batch partial top-k, and merges.
    The score is pure integer arithmetic (tf_j x (N*1000 // df_j)) so
    Ray and the SQL oracle agree bit-exactly — no float log in the
    hash path.  Nothing materializes: two streaming text passes, O(k x
    blocks) rows into the final merge."""
    from tokcodec.functions.text import split_words

    terms = TFIDF_TERMS

    def tf_matrix(batch: pa.Table):
        words, doc_idx, n = split_words(batch.column("text"))
        w = words.cast(pa.string())
        tfs = []
        for t in terms:
            m = np.asarray(pc.equal(w, t).fill_null(False))
            tfs.append(np.bincount(doc_idx[m], minlength=n).astype(np.int64))
        return tfs, n

    # wave 1: (N, df_j) — one tiny row per batch, summed on the driver
    def df_partial(batch: pa.Table) -> pa.Table:
        tfs, n = tf_matrix(batch)
        cols = {"n_docs": pa.array([n], type=pa.int64())}
        for t, tf in zip(terms, tfs):
            cols[f"df_{t}"] = pa.array([int((tf > 0).sum())], type=pa.int64())
        return pa.table(cols)

    parts = (
        _rp(sf_dir, "documents", columns=["text"])
        .map_batches(df_partial, batch_format="pyarrow")
        .take_all()
    )  # O(blocks) rows of O(terms) ints
    n_total = sum(r["n_docs"] for r in parts)
    weights = []
    for t in terms:
        df = sum(r[f"df_{t}"] for r in parts)
        weights.append((n_total * 1000) // df if df else 0)

    # wave 2: per-doc integer score, per-batch partial top-k, merge
    def score_topk(batch: pa.Table) -> pa.Table:
        tfs, n = tf_matrix(batch)
        score = np.zeros(n, dtype=np.int64)
        for wgt, tf in zip(weights, tfs):
            score += wgt * tf
        t = pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "score": pa.array(score, type=pa.int64()),
            }
        )
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        return t.take(idx.slice(0, TFIDF_K))

    partials = _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score_topk, batch_format="pyarrow"
    )
    return partials.sort(["score", "doc_id"], descending=[True, False]).limit(TFIDF_K)


def _tfidf_oracle_sql() -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in TFIDF_TERMS
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in TFIDF_TERMS
    )
    score = " + ".join(
        f"tf_{t} * (CASE WHEN st.df_{t} = 0 THEN 0 "
        f"ELSE (st.n_total * 1000) // st.df_{t} END)"
        for t in TFIDF_TERMS
    )
    return (
        "WITH ws AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS w "
        "FROM documents), "
        f"tf AS (SELECT doc_id, {tf_cols} FROM ws), "
        f"st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total, {df_cols} FROM tf) "
        f"SELECT doc_id, CAST({score} AS BIGINT) AS score FROM tf, st "
        f"ORDER BY score DESC, doc_id LIMIT {TFIDF_K}"
    )


def docs_stats_by_lang(sf_dir: str):
    """Partial-aggregation shape (see agg_lineitem_pricing): each batch
    collapses to ≤|langs| rows before the exchange."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        return pa.table(
            {
                "lang": g.column("lang"),
                "pn": g.column("count_all"),
                "ps": g.column("n_chars_sum"),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "lang"
    ).aggregate(
        Sum("pn", alias_name="n_docs"), Sum("ps", alias_name="total_chars")
    )


def agg_lineitem_pricing(sf_dir: str):
    """Grouped pricing summary with PARTIAL aggregation: the key space
    is tiny (|returnflag × linestatus| = 6), so each batch collapses to
    ≤6 partial rows via Arrow's native group_by before the exchange —
    the groupby shuffle moves O(blocks × 6) rows instead of every
    lineitem row (count_all/sum/max/min are all mergeable monoids;
    COUNT(*) semantics via count_all, not non-null count)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _rp(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [([], "count_all"), ("l_quantity", "sum"),
             ("l_extendedprice", "max"), ("l_extendedprice", "min")]
        )
        # select BY NAME: aggregate output column order is pyarrow-
        # version-dependent (keys first on 16.x, last on older)
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "pn": g.column("count_all"),
                "ps": g.column("l_quantity_sum"),
                "pmx": g.column("l_extendedprice_max"),
                "pmn": g.column("l_extendedprice_min"),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("pn", alias_name="n"),
        Sum("ps", alias_name="sum_qty"),
        Max("pmx", alias_name="max_price"),
        Min("pmn", alias_name="min_price"),
    )


def agg_events_by_type(sf_dir: str):
    """Same partial-aggregation shape as agg_lineitem_pricing (the
    event-type key space is tiny, so each batch collapses before the
    exchange)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [([], "count_all"), ("value", "max"), ("value", "min")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "pn": g.column("count_all"),
                "pmx": g.column("value_max"),
                "pmn": g.column("value_min"),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "event_type"
    ).aggregate(
        Sum("pn", alias_name="n"),
        Max("pmx", alias_name="max_value"),
        Min("pmn", alias_name="min_value"),
    )


# ------------------------------------------------ relational patterns ----


def quantiles_lineitem_price(sf_dir: str):
    """Exact distributed quantiles WITHOUT a sort: iterative histogram
    selection (O(passes) streaming scans, O(bins) driver state) —
    value-exact against DuckDB quantile_disc."""
    from tokcodec.functions.quantile import quantiles_disc

    ds = _rp(sf_dir, "lineitem", columns=["l_extendedprice"])
    qs = [0.5, 0.9, 0.99]
    vals = quantiles_disc(ds, "l_extendedprice", qs)
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "v": pa.array(vals, pa.float64())}
    )


def quantiles_by_lang(sf_dir: str):
    """Exact PER-GROUP quantiles without a sort: every (group, q)
    selection advances in the same streaming histogram scan per pass
    (`quantile.grouped_quantiles_disc`) — O(groups x qs x bins) driver
    state, scan count independent of group count."""
    from tokcodec.functions.quantile import grouped_quantiles_disc

    ds = _rp(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_quantiles_disc(ds, "lang", "n_chars", [0.5, 0.9, 0.99])


def _quantiles_by_lang_oracle_sql() -> str:
    parts = " UNION ALL ".join(
        f"SELECT lang, {q} AS q, CAST(quantile_disc(n_chars, {q}) AS DOUBLE) AS v "
        "FROM documents GROUP BY lang"
        for q in (0.5, 0.9, 0.99)
    )
    return f"SELECT * FROM ({parts}) ORDER BY lang, q"


def approx_quantiles_check(sf_dir: str):
    """ONE-PASS approximate quantiles (deterministic hash-threshold row
    sample, exact selection on the sample) verified against exact rank
    windows, in the recall-oracle style: the Ray side computes approx
    p50/p90 AND the exact values at q±0.05 (via the already-oracled
    `quantiles_disc`) and returns the verdicts; the SQL oracle pins the
    expected all-true table."""
    from tokcodec.functions.quantile import approx_quantiles_disc, quantiles_disc

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    qs = [0.5, 0.9]
    approx = approx_quantiles_disc(
        ds, "l_extendedprice", qs, rate=0.2, key_col="l_orderkey"
    )
    bounds = quantiles_disc(
        ds, "l_extendedprice", [0.45, 0.55, 0.85, 0.95]
    )
    ok = [
        bounds[0] <= approx[0] <= bounds[1],
        bounds[2] <= approx[1] <= bounds[3],
    ]
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "within_bounds": pa.array(ok, pa.bool_())}
    )


def _approx_quantiles_oracle_sql() -> str:
    return (
        "SELECT 0.5 AS q, true AS within_bounds "
        "UNION ALL SELECT 0.9, true ORDER BY q"
    )


def topk_documents(sf_dir: str):
    """sort + limit (top-k): deterministic tie-break on doc_id."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def distinct_langs(sf_dir: str):
    """DISTINCT with a per-batch combiner: each batch emits only its
    distinct values, so the unique() exchange moves O(blocks × |langs|)
    rows instead of one row per document."""
    ds = _rp(sf_dir, "documents", columns=["lang"])
    vals = ds.map_batches(
        lambda t: pa.table(
            {"lang": pc.unique(t.column("lang").combine_chunks())}
        ),
        batch_format="pyarrow",
    ).unique("lang")
    return pa.table({"lang": pa.array(sorted(vals), type=pa.string())})


def window_events(sf_dir: str):
    """Tumbling 1h event-time window per event_type — the batch form of a
    streaming windowed aggregate (ray_guide 'Streaming-shaped workloads')."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def add_win(batch: pa.Table) -> pa.Table:
        # exact integer floor division (numpy // floors toward -inf) so
        # pre-1970 timestamps agree with DuckDB's floor(epoch(ts)/3600);
        # nulls propagate to a null window (DuckDB groups them as NULL)
        arr = batch.column("ts").cast(pa.int64()).combine_chunks()
        mic = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
        win = mic // 3_600_000_000
        mask = (
            pc.is_null(arr).to_numpy(zero_copy_only=False)
            if arr.null_count
            else None
        )
        return batch.append_column(
            "win", pa.array(win, type=pa.int64(), mask=mask)
        ).drop_columns(["ts"])

    def partial(t: pa.Table) -> pa.Table:
        # combiner: a batch holds few distinct (type, window) cells, so
        # collapse locally before the exchange (count_all keeps COUNT(*))
        g = t.group_by(["event_type", "win"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "win": g.column("win"),
                "pn": g.column("count_all"),
            }
        )

    return sorted_group_reduce(
        ds.map_batches(add_win, batch_format="pyarrow").map_batches(
            partial, batch_format="pyarrow"
        ),
        ["event_type", "win"],
        [("pn", "sum", "n")],
    )


def sessionize_events(sf_dir: str):
    """Gap-based sessionization (30 min) per user via the block-stitched
    operator (functions/sessionize.py): one sort shuffle, vectorized
    per-block session pass, O(blocks) driver stitching — no per-user
    Python callable (the previous groupby(user).map_groups form was one
    pandas lambda per user: 10^9 calls at 10^9 users)."""
    from tokcodec.functions.sessionize import sessionize

    return sessionize(_rp(sf_dir, "events", columns=["user_id", "ts"]))


# broadcast-join small-side guard: above this the build side no longer
# fits comfortably in one task's heap and a shuffle join is the right plan
_BROADCAST_MAX_ROWS = 50_000_000


def join_lineitem_orders(sf_dir: str):
    """Broadcast hash join: the small side (orders key→priority) is two
    Arrow arrays ray.put ONCE and read per task zero-copy from local
    plasma — no shuffle; the probe is pc.index_in + pc.take (no Python
    dict), then a partial pre-aggregate per batch before the tiny
    groupby."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    if orders.num_rows > _BROADCAST_MAX_ROWS:
        raise ValueError(
            f"broadcast side has {orders.num_rows} rows > {_BROADCAST_MAX_ROWS}; "
            "use a hash-partitioned shuffle join instead"
        )
    key_arr = orders.column("o_orderkey").combine_chunks()
    prio_arr = orders.column("o_orderpriority").combine_chunks()
    ref = ray.put((key_arr, prio_arr))

    def partial(batch: pa.Table) -> pa.Table:
        keys, prios = ray.get(ref)
        idx = pc.index_in(batch.column("l_orderkey"), value_set=keys)
        hit = pc.take(prios, idx)  # null where no matching order (inner join drops)
        counts = pc.value_counts(hit.combine_chunks())
        vals, ns = counts.field("values"), counts.field("counts")
        keep = pc.is_valid(vals)
        return pa.table(
            {
                "o_orderpriority": vals.filter(keep).cast(pa.string()),
                "n": ns.filter(keep).cast(pa.int64()),
            }
        )

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"))
    )


def shuffle_join_lineitem_orders(sf_dir: str):
    """Hash-partitioned SHUFFLE join via Ray Data's native Dataset.join —
    the fallback plan when the build side exceeds _BROADCAST_MAX_ROWS
    (both sides exchange by key hash; no driver-side state at all).
    Same result as the broadcast variant, checked by the same oracle."""
    from ray.data.aggregate import Count

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return joined.groupby("o_orderpriority").aggregate(Count(alias_name="n"))


def asof_join_events_orders(sf_dir: str):
    """As-of join (operator Ray Data lacks, built as a co-group
    composition): each event matched to the customer's latest order at
    or before the event time; oracle = DuckDB's native ASOF JOIN.
    Emits the matched order date (deterministic under ties) rather than
    an arbitrary tied order's id."""
    from tokcodec.functions.joins import asof_join

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    return asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols=["event_id"],
        out_ts="o_orderdate",
    )


def band_join_events(sf_dir: str):
    """Range (band) self-join: per event, the count of the same user's
    events within ±1 hour (activity density, includes the event itself)
    — co-group + per-group vectorized interval counting; oracle = the
    equivalent inequality join in DuckDB."""
    from tokcodec.functions.joins import band_join_count

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    ev2 = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return band_join_count(
        ev,
        ev2,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_cols=["event_id"],
        lo_offset_us=-3_600_000_000,
        hi_offset_us=3_600_000_000,
    )


def distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-count sketch with an accuracy bar: the Ray
    side emits (n_exact, ok=|est-exact|/exact <= 5%); the oracle emits
    (COUNT(DISTINCT), true) — hash-equal iff the exact counts agree AND
    the sketch meets the bar."""
    from tokcodec.functions.sketch import hll_count_distinct

    ds = _rp(sf_dir, "events", columns=["user_id"])
    est = hll_count_distinct(ds, "user_id")
    exact = len(_rp(sf_dir, "events", columns=["user_id"]).unique("user_id"))
    ok = abs(est - exact) / max(exact, 1) <= 0.05
    return pa.table(
        {"n_exact": pa.array([exact], pa.int64()), "ok": pa.array([ok], pa.bool_())}
    )


def having_orders(sf_dir: str):
    """GROUP BY + HAVING: per-batch partial counts (the standard
    combiner — a customer's orders co-located in a block collapse to
    one row before the exchange), merge, then vectorized post-filter."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "orders", columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table(
            {"o_custkey": g.column("o_custkey"), "pn": g.column("count_all")}
        )

    agg = sorted_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"],
        [("pn", "sum", "n")],
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), 5)), batch_format="pyarrow"
    )


def antijoin_customers(sf_dir: str):
    """Anti join via broadcast key set: customers with no orders.  The
    order-key set is ray.put once and the filter runs vectorized per
    batch (pc.is_in) — the semi/anti-join pattern without a shuffle."""
    import pyarrow.parquet as pq
    import ray

    keys = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    urgent = keys.filter(pc.equal(keys.column("o_orderpriority"), "1-URGENT"))
    key_arr = pc.unique(urgent.column("o_custkey").combine_chunks())
    ref = ray.put(key_arr)

    def anti(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.invert(pc.is_in(batch.column("c_custkey"), value_set=ks))
        return batch.filter(mask)

    return _rp(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        anti, batch_format="pyarrow"
    )


# ------------------------------------------------------------- dedup ----


def dedup_exact_documents(sf_dir: str):
    """Oracle-parity mode: md5 content key, matching DuckDB's md5()."""
    return dedup.exact_dedup(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), method="md5"
    )


def dedup_exact_fnv_documents(sf_dir: str):
    """The DEFAULT (hot-path) exact dedup: vectorized 128-bit FNV keys.
    Oracle checks the surviving id set — GROUP BY text itself — so the
    hash never appears in the contract."""
    out = dedup.exact_dedup(_rp(sf_dir, "documents", columns=["doc_id", "text"]))
    return out.select_columns(["doc_id"])


def _docs_with_near_dups(sf_dir: str):
    """documents ∪ mutated copies (ids offset by 1M): deterministic
    near-duplicates so near-dup operators have non-trivial output."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def mutate(batch: pa.Table) -> pa.Table:
        ids = pc.add(batch.column("doc_id"), 1_000_000)
        texts = pc.binary_join_element_wise(
            batch.column("text"), pa.scalar("extra tail token"), " "
        )
        return pa.table({"doc_id": ids, "text": texts})

    half = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t.column("doc_id"), 7), 0)),
        batch_format="pyarrow",
    )
    return ds.union(half.map_batches(mutate, batch_format="pyarrow"))


def dedup_minhash_recall(sf_dir: str):
    """Recall bar for the MinHash-LSH near-dup pipeline (VERDICT r2
    missing #2): the injected near-dups are deterministic — (id, id+1M)
    for every id % 8 == 0 — so 'the pipeline recovers >= 95% of them at
    tau=0.5' is oracle-checkable the way the ANN recall queries are: the
    oracle emits the injected count and TRUE; rows hash-match iff the
    Ray side measured the same count and met the bar."""
    return _dedup_recall_bar(sf_dir)


def _dedup_recall_bar(sf_dir: str, **shingle_kw) -> pa.Table:
    """Shared injected-pair recall bar: LSH candidates -> exact Jaccard
    verify (word- or char-shingled via `shingle_kw`) -> did the pipeline
    recover >= 95% of the deterministic (id, id+1M) near-dups?

    Driver state is bounded by the pipeline's own verified-pair output
    (already materialized by verify_jaccard's scoring tail), never the
    corpus: the injected COUNT is a distributed aggregate over
    documents, and the hits are read straight off the verified pairs —
    a pair (a, a+1M) with a % 8 == 0 IS an injected pair recovered, so
    no per-id membership loop over a driver-side corpus list."""
    ds = _docs_with_near_dups(sf_dir)
    pairs = dedup.lsh_candidate_pairs(ds, **shingle_kw)
    verified = dedup.verify_jaccard(ds, pairs, tau=0.5, **shingle_kw)
    hit = len(
        {
            r["a"]
            for r in verified
            if r["a"] % 8 == 0 and r["b"] == r["a"] + 1_000_000
        }
    )
    n = int(
        _rp(sf_dir, "documents", columns=["doc_id"])
        .map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.equal(
                                        pc.bit_wise_and(t.column("doc_id"), 7), 0
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("n")
    )
    return pa.table(
        {
            "n_injected": pa.array([n], pa.int64()),
            "recall_ok": pa.array([n > 0 and hit / n >= 0.95], pa.bool_()),
        }
    )


def dedup_ngram_recall(sf_dir: str):
    """Recall bar for char-n-gram Jaccard near-dup — the brief's
    'n-gram Jaccard' dedup method as an END-TO-END pipeline (not just
    the per-doc profile): MinHash-LSH candidates over hashed char
    4-gram shingles (`dedup.lsh_candidate_pairs(shingle="char")`), then
    exact char-4-gram Jaccard verification at tau=0.5, with the same
    injected-pair (id, id+1M) recall bar as dedup_minhash_recall.  The
    scale shape is identical to the word-shingle pipeline: vectorized
    shingle→signature batches, banded bucket groupby with capped pair
    emission, broadcast-or-shuffle-join exact verification."""
    return _dedup_recall_bar(sf_dir, shingle="char", k=4)


def dedup_simhash_recall(sf_dir: str):
    """Recall bar for SimHash near-dup (same pattern as
    dedup_minhash_recall): every injected (id, id+1M) mutation pair must
    sit within Hamming distance 12 of its original for >= 95% of pairs.
    Fully aggregate-shaped: signatures per batch, ONE sort-based
    reduce over the near-unique pair_key (functions/sortagg.py — Ray's
    native groupby is per-group Python at reduce time) pulling both
    sides' signatures onto one row, then a vectorized XOR+popcount pass
    and a Sum/Count reduce — no per-pair Python stage, no driver-side
    signature state."""
    from ray.data.aggregate import Sum

    ds = _docs_with_near_dups(sf_dir)
    sigs = ds.map_batches(
        lambda t: dedup.simhash_batch(t).select(["doc_id", "simhash"]),
        batch_format="pyarrow",
    )

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        mut = ids >= 1_000_000
        sig = t.column("simhash")
        return pa.table(
            {
                "pair_key": pa.array(np.where(mut, ids - 1_000_000, ids), pa.int64()),
                "sig_o": pc.if_else(pa.array(mut), pa.nulls(len(t), pa.int64()), sig),
                "sig_m": pc.if_else(pa.array(~mut), pa.nulls(len(t), pa.int64()), sig),
            }
        )

    both = sorted_group_reduce(
        sigs.map_batches(tag, batch_format="pyarrow"),
        ["pair_key"],
        [("sig_o", "max", "o"), ("sig_m", "max", "m")],
    )

    def score(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t.column("o")), pc.is_valid(t.column("m")))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"inj": pa.array([], pa.int64()), "ok": pa.array([], pa.int64())})
        o = t.column("o").to_numpy().view(np.uint64)
        m = t.column("m").to_numpy().view(np.uint64)
        x = o ^ m
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        return pa.table(
            {
                "inj": pa.array(np.ones(len(ham), np.int64)),
                "ok": pa.array((ham <= 12).astype(np.int64)),
            }
        )

    agg = (
        both.map_batches(score, batch_format="pyarrow")
        .aggregate(Sum("inj", alias_name="n_injected"), Sum("ok", alias_name="n_ok"))
    )
    n, ok = int(agg["n_injected"] or 0), int(agg["n_ok"] or 0)
    return pa.table(
        {
            "n_injected": pa.array([n], pa.int64()),
            "recall_ok": pa.array([n > 0 and ok / n >= 0.95], pa.bool_()),
        }
    )


def ngram_profile_documents(sf_dir: str):
    """Distinct CHARACTER 4-gram count per doc (n-gram Jaccard's per-doc
    building block), vectorized via UTF-8 char-start detection; oracle =
    DuckDB VARCHAR substrings + list_distinct (character-level semantics
    on both sides)."""
    return _rp(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        dedup.ngram_profile, batch_format="pyarrow"
    )


# -------------------------------------------------------- similarity ----


def _query_matrix(sf_dir: str, n: int = 3) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, n)
    return np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])


def ann_bruteforce(sf_dir: str):
    q = _query_matrix(sf_dir, n=3)
    rows = ann.brute_force_topk(_rp(sf_dir, "embeddings"), q, k=5)
    return pa.Table.from_pylist(
        [{"query": r["query"], "vec_id": r["vec_id"]} for r in rows]
    )


def _recall_ok_queries(sf_dir: str, approx_rows: list, k: int = 5, tau: float = 0.6):
    """Queries whose recall@k vs exact brute force meets `tau` — the
    oracle-checkable form of an ANN quality bar: the oracle lists ALL
    query ids, so the row sets match iff every query meets the bar."""
    q = _query_matrix(sf_dir, n=3)
    brute = ann.brute_force_topk(_rp(sf_dir, "embeddings"), q, k=k)
    bsets: dict[int, set] = {}
    for r in brute:
        bsets.setdefault(r["query"], set()).add(r["vec_id"])
    asets: dict[int, set] = {}
    for r in approx_rows:
        asets.setdefault(r["query"], set()).add(r["vec_id"])
    ok = [
        qi
        for qi in sorted(bsets)
        if len(bsets[qi] & asets.get(qi, set())) / k >= tau
    ]
    return pa.table({"query": pa.array(ok, pa.int64())})


def ann_lsh_recall(sf_dir: str):
    """recall@5 of multi-table LSH vs brute force, >= 0.6 per query
    (VERDICT round-1 item 9: the approximate operators leave rows-only)."""
    q = _query_matrix(sf_dir, n=3)
    rows = ann.lsh_topk(_rp(sf_dir, "embeddings"), q, k=5)
    return _recall_ok_queries(sf_dir, rows)


def ann_ivf_recall(sf_dir: str):
    """recall@5 of IVF (16 centroids, 8 probes) vs brute force, >= 0.6
    per query."""
    ds = _rp(sf_dir, "embeddings")
    cents = ann.ivf_build(ds, k=16)
    q = _query_matrix(sf_dir, n=3)
    rows = ann.ivf_topk(ds, cents, q, k=5, n_probe=8)
    return _recall_ok_queries(sf_dir, rows)


def ann_ivf_partitioned_recall(sf_dir: str):
    """The IVF SCALE path: corpus hive-partitioned by nearest centroid
    at build (one shuffle, once), probes read only matching partition
    dirs; recall@5 vs brute force >= 0.6 per query."""

    ds = _rp(sf_dir, "embeddings")
    cents = ann.ivf_build(ds, k=16)
    out = _scratch_dir("ivfpart", sf_dir)
    ann.ivf_partition(ds, cents, out)
    q = _query_matrix(sf_dir, n=3)
    rows = ann.ivf_topk_partitioned(out, cents, q, k=5, n_probe=8)
    return _recall_ok_queries(sf_dir, rows)


def embedding_dups(sf_dir: str):
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": pc.add(batch.column("vec_id"), 1_000_000),
             "embedding": batch.column("embedding")}
        )

    half = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t.column("vec_id"), 15), 0)),
        batch_format="pyarrow",
    )
    both = ds.union(half.map_batches(shift, batch_format="pyarrow"))
    # emit id pairs only: the oracle is the exact all-pairs inequality
    # join (cosine >= tau), value-identical because tau=0.999 pairs are
    # exact duplicates and identical vectors always share LSH signatures;
    # the float sim stays out of the hash contract
    return ann.embedding_near_dups(both, tau=0.999).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    )


# -------------------------------------------------------- multimodal ----


def multimodal_meta_documents(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": batch.column("text").cast(pa.binary()),
            }
        )

    return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        lambda t: multimodal.payload_meta(t).select(["doc_id", "payload_bytes"]),
        batch_format="pyarrow",
    )


def multimodal_features(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": pc.cast(batch.column("doc_id"), pa.string()),
                "payload": batch.column("text").cast(pa.binary()),
                "media_type": pa.array(["image"] * batch.num_rows),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    # real=False pins the deterministic md5 fake: the payloads are
    # synthetic bytes and the oracle SQL reproduces exactly that path —
    # auto-probing a codec here would break parity wherever PIL exists
    feats = multimodal.extract_features(media, dim=8, concurrency=2, real=False)

    def flatten(t: pa.Table) -> pa.Table:
        f = t.column("features").combine_chunks()
        vals = np.asarray(f.values, dtype=np.float64).reshape(-1, 8)
        cols: dict = {"media_id": t.column("media_id")}
        for j in range(8):
            cols[f"f{j}"] = pa.array(vals[:, j], pa.float64())
        cols["payload_bytes"] = t.column("payload_bytes")
        return pa.table(cols)

    # flat f0..f7 so the md5-byte feature contract is hashable by the
    # driver against the SQL oracle (md5_number_upper byte extraction)
    return feats.map_batches(flatten, batch_format="pyarrow")


# ------------------------------------------------- corpus-mix (sample) ----

SAMPLE_RATE = 0.4
SPLIT_FRACTIONS = {"train": 0.6, "val": 0.2, "test": 0.2}
MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}  # rest drop


def mix_documents(sf_dir: str):
    """Deterministic per-source corpus mixing in one shuffle-free pass
    (md5 oracle-parity mode): keep iff hash(doc_id) < threshold(rate of
    the row's source); nested across rates so mixture retuning only
    adds/removes the marginal rows."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return sample.mix_sources(ds, MIX_RATES, method="md5")


def _mix_oracle_sql() -> str:
    # rate >= 1.0 is keep-all (matches mix_sources' inclusive sentinel
    # compare — a strict < against the clamped max would drop a row
    # whose hash equals 2^64-1)
    whens = " ".join(
        f"WHEN source = '{g}' THEN "
        + (
            "TRUE"
            if r >= 1.0
            else f"md5_number_lower(CAST(doc_id AS VARCHAR)) < {sample.rate_threshold(r)}::UBIGINT"
        )
        for g, r in MIX_RATES.items()
    )
    return (
        "SELECT doc_id, source FROM documents "
        f"WHERE CASE {whens} ELSE FALSE END"
    )
QUOTA_BUDGET = 4000  # bytes of text per source group


def sample_documents(sf_dir: str):
    """Deterministic Bernoulli sample (md5 oracle-parity mode): the
    driver-checked face of `sample.sample_dataset`; the scale path is
    the vectorized fnv mode (unit-tested equivalent semantics)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return sample.sample_dataset(ds, SAMPLE_RATE, key_col="doc_id", method="md5")


def split_documents(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return sample.split_dataset(
        ds, SPLIT_FRACTIONS, key_col="doc_id", out="split", method="md5"
    )


TOPK_PER_GROUP = 5


def topk_per_source(sf_dir: str):
    """Distributed per-group top-k (best k docs per source by length):
    two-wave plan in `sample.grouped_topk` — per-block prune to <= k
    rows per group, then one bounded groupby(source) merge; shuffle
    volume O(groups x k x blocks), never a global sort."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return sample.grouped_topk(
        ds, group_col="source", order_col="n_chars", k=TOPK_PER_GROUP,
        tie_col="doc_id",
    )


def _topk_per_source_oracle_sql() -> str:
    return (
        "SELECT doc_id, source, n_chars FROM documents "
        "QUALIFY ROW_NUMBER() OVER ("
        "  PARTITION BY source ORDER BY n_chars DESC, doc_id"
        f") <= {TOPK_PER_GROUP}"
    )


def quota_documents(sf_dir: str):
    """Per-source byte budget via the two-wave bucketed prefix-sum plan
    (md5 mode so DuckDB's window cumsum is the exact oracle)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def add_bytes(t: pa.Table) -> pa.Table:
        nb = pc.binary_length(t.column("text"))
        return t.append_column("n_bytes", pc.cast(nb, pa.int64()))

    withb = ds.map_batches(add_bytes, batch_format="pyarrow")
    kept = sample.group_quota(
        withb,
        group_col="source",
        mass_col="n_bytes",
        budget=QUOTA_BUDGET,
        key_col="doc_id",
        method="md5",
    )
    return kept.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow"
    )


def _sample_oracle_sql() -> str:
    thr = sample.rate_threshold(SAMPLE_RATE)
    return (
        "SELECT doc_id, source, n_chars FROM documents "
        f"WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) < {thr}::UBIGINT"
    )


def _split_oracle_sql() -> str:
    cuts = sample.split_thresholds(SPLIT_FRACTIONS)
    h = "md5_number_lower(CAST(doc_id AS VARCHAR))"
    whens = " ".join(
        f"WHEN {h} < {thr}::UBIGINT THEN '{name}'" for name, thr in cuts[:-1]
    )
    return (
        f"SELECT doc_id, source, CASE {whens} ELSE '{cuts[-1][0]}' END AS split "
        "FROM documents"
    )


def _quota_oracle_sql() -> str:
    return (
        "SELECT doc_id, source FROM ("
        "  SELECT doc_id, source,"
        "         SUM(strlen(text)) OVER ("
        "           PARTITION BY source"
        "           ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)),"
        "                    CAST(doc_id AS VARCHAR)) AS cum"
        "  FROM documents"
        f") WHERE cum <= {QUOTA_BUDGET}"
    )


# ------------------------------------------------- vocab compaction ----


def vocab_remap_events(sf_dir: str):
    """Vocabulary compaction (functions/vocab.py) end-to-end on a
    SQL-knowable id column: frequency-rank events.user_id (two-wave
    count: per-block partials → one native groupby sum), broadcast the
    mapping once, rewrite the column through the per-actor LUT, then
    re-aggregate the REWRITTEN column — so the output (new_id, n_events)
    proves the remap pass itself, and DuckDB's window-rank oracle
    reproduces it exactly.  The same operator compacts tokens list
    columns (tests/test_vocab.py covers that path against a numpy
    reference; token ids are hash-derived so not SQL-expressible)."""
    from ray.data.aggregate import Count

    from tokcodec.functions import vocab

    ds = _rp(sf_dir, "events", columns=["user_id"])
    remapped, _old, _new = vocab.compact_vocab(ds, col="user_id")

    def partial_n(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return pa.table(
            {"user_id": g.column("user_id"),
             "pn": pc.cast(g.column("count_all"), pa.int64())}
        )

    out = sorted_group_reduce(
        remapped.map_batches(partial_n, batch_format="pyarrow"),
        ["user_id"],
        [("pn", "sum", "n_events")],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "new_id": pc.cast(t.column("user_id"), pa.int64()),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _vocab_remap_oracle_sql() -> str:
    return (
        "SELECT row_number() OVER (ORDER BY count(*) DESC, user_id ASC) - 1 "
        "AS new_id, count(*) AS n_events FROM events GROUP BY user_id"
    )


# -------------------------------------------- deterministic shuffle ----

SHUFFLE_SEED = 7


def shuffle_documents(sf_dir: str):
    """Seeded epoch shuffle (functions/shuffle.py): every row's global
    position in the reproducible epoch order, md5 mode so DuckDB's
    window rank over the same hash is the exact per-row oracle.  The
    fnv mode (vectorized, no per-row Python) is the scale path —
    determinism/permutation properties covered in tests/test_shuffle.py."""
    from tokcodec.functions import shuffle as shmod

    ds = _rp(sf_dir, "documents", columns=["doc_id"])
    out = shmod.epoch_shuffle(ds, key_col="doc_id", seed=SHUFFLE_SEED, method="md5")
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "epoch_pos": t.column("epoch_pos"),
            }
        ),
        batch_format="pyarrow",
    )


def _shuffle_oracle_sql() -> str:
    return (
        "SELECT doc_id, row_number() OVER (ORDER BY "
        f"md5_number_lower('{SHUFFLE_SEED}-' || CAST(doc_id AS VARCHAR)), "
        "doc_id) - 1 AS epoch_pos FROM documents"
    )


# -------------------------------------------- multi-way (star) join ----


def join_revenue_by_nation(sf_dir: str):
    """TPC-H-q5-style star join: lineitem ⋈ supplier ⋈ nation ⋈ region,
    WHERE r_name = 'ASIA', GROUP BY n_name.  The dimension side folds in
    two tiers: nation ⋈ region is constant-size by star-schema contract
    (25 × 5 rows) and folds on the driver into a nationkey→name map,
    but supplier SCALES with the corpus (sf × 10k rows in TPC-H), so it
    is folded DISTRIBUTIVELY — a pruned Ray read of (s_suppkey,
    s_nationkey) filtered per batch against the ray.put nation map, with
    only the matching ~|ASIA|/|nations| fraction streamed back to build
    the (suppkey → nation-name) LUT.  The collected LUT is guarded by
    `_BROADCAST_MAX_ROWS` (same contract as join_lineitem_orders: above
    it a broadcast join is the wrong plan) and shipped via ray.put ONCE
    — read zero-copy from local plasma per task, never re-pickled into
    a per-task closure.  The fact table never shuffles for the join;
    only O(blocks × |nations|) partial rows move for the aggregate.
    Revenue is integer-exact (cents × discount-percent) so float
    summation order can't break the driver's value hash.  Rounding is
    floor(x*100 + 0.5) — half-away-from-zero on the non-negative TPC-H
    monetary columns, matching DuckDB ROUND (np.rint is half-to-even:
    latent divergence on inputs landing exactly on .5)."""
    import pyarrow.parquet as pqt
    import ray
    from ray.data.aggregate import Sum

    nat = pqt.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pqt.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(asia)]
    nkeys_drv = nat["n_nationkey"].to_numpy().astype(np.int64)
    norder = np.argsort(nkeys_drv)
    nmap_ref = ray.put(
        (nkeys_drv[norder], nat["n_name"].to_numpy().astype(object)[norder])
    )

    def _fold_sup(t: pa.Table) -> pa.Table:
        nkeys, nnames = ray.get(nmap_ref)
        if len(nkeys) == 0:
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "n_name": pa.array([], pa.string()),
                }
            )
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nkeys, nk)
        ok = (pos < len(nkeys)) & (nkeys[np.minimum(pos, len(nkeys) - 1)] == nk)
        return pa.table(
            {
                "s_suppkey": pa.array(
                    t.column("s_suppkey").to_numpy(zero_copy_only=False)[ok],
                    pa.int64(),
                ),
                "n_name": pa.array(nnames[pos[ok]].tolist(), pa.string()),
            }
        )

    lut_parts, lut_rows = [], 0
    for part in _rp(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_fold_sup, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        lut_rows += part.num_rows
        if lut_rows > _BROADCAST_MAX_ROWS:
            raise ValueError(
                f"suppkey->nation LUT exceeds {_BROADCAST_MAX_ROWS} rows; "
                "use a hash-partitioned shuffle join instead"
            )
        lut_parts.append(part)
    lut = (
        pa.concat_tables(lut_parts)
        if lut_parts
        else pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "n_name": pa.array([], pa.string())}
        )
    )
    skeys = lut.column("s_suppkey").to_numpy(zero_copy_only=False)
    order = np.argsort(skeys)
    lut_ref = ray.put(
        (
            skeys[order],
            lut.column("n_name").to_numpy(zero_copy_only=False)[order],
        )
    )

    ds = _rp(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        keys, names = ray.get(lut_ref)
        empty = pa.table(
            {"n_name": pa.array([], pa.string()), "pr": pa.array([], pa.int64())}
        )
        if len(keys) == 0:  # no ASIA suppliers at all: empty join result
            return empty
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, sk)
        ok = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == sk)
        if not ok.any():
            return empty
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[ok]
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)[ok]
        rev = np.floor(price * 100 + 0.5).astype(np.int64) * (
            100 - np.floor(disc * 100 + 0.5).astype(np.int64)
        )
        g = pa.table(
            {
                "n_name": pa.array(names[pos[ok]].tolist(), pa.string()),
                "pr": pa.array(rev, pa.int64()),
            }
        ).group_by("n_name").aggregate([("pr", "sum")])
        return pa.table({"n_name": g.column("n_name"), "pr": g.column("pr_sum")})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("pr", alias_name="revenue"))
    )


def _join_revenue_oracle_sql() -> str:
    return (
        "SELECT n_name, CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue "
        "FROM lineitem, supplier, nation, region "
        "WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey "
        "AND n_regionkey = r_regionkey AND r_name = 'ASIA' GROUP BY n_name"
    )


# ---------------------------------------------- incremental dedup ----


def dedup_incremental_documents(sf_dir: str):
    """Incremental exact dedup against a persisted hash index
    (functions/incdedup.py): documents split deterministically into an
    'existing corpus' (n_chars % 3 != 0), which seeds the index, and a
    'new batch' (n_chars % 3 == 0) deduped against it.  The new batch
    also carries injected overlap — echoes of existing docs (id + 1M,
    same text: must drop regardless of id order) and self-duplicates
    (id + 2M: min id wins within the batch) — so all three verdict
    paths (new / known / within-batch dup) are exercised.  Result = the
    accepted doc_ids of the new batch."""
    from tokcodec.functions.incdedup import dedup_against_index

    idx = _scratch_dir("incidx", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def _existing(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(nc % 3 != 0)).select(["doc_id", "text"])

    def _new_batch(t: pa.Table) -> pa.Table:
        # one pass per block builds all three branches (base + echoes +
        # self-dups) — no second scan of the parquet per branch
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        ex = t.filter(pa.array(nc % 3 != 0))
        nb = t.filter(pa.array(nc % 3 == 0)).select(["doc_id", "text"])
        exd = ex.column("doc_id").to_numpy(zero_copy_only=False)
        nbd = nb.column("doc_id").to_numpy(zero_copy_only=False)
        echo = ex.filter(pa.array(exd % 5 == 0))
        sdup = nb.filter(pa.array(nbd % 7 == 0))
        return pa.concat_tables(
            [
                nb,
                pa.table(
                    {
                        "doc_id": pc.add(echo.column("doc_id"), 1_000_000),
                        "text": echo.column("text"),
                    }
                ),
                pa.table(
                    {
                        "doc_id": pc.add(sdup.column("doc_id"), 2_000_000),
                        "text": sdup.column("text"),
                    }
                ),
            ]
        )

    existing = ds.map_batches(_existing, batch_format="pyarrow")
    newb = ds.map_batches(_new_batch, batch_format="pyarrow")
    dedup_against_index(existing, idx, n_buckets=64, run_id="seed")
    accepted = dedup_against_index(newb, idx, n_buckets=64, run_id="batch1")
    return accepted.select_columns(["doc_id"])


def dedup_incremental_minhash_recall(sf_dir: str):
    """Recall/precision bar for the incremental NEAR-dup filter
    (functions/incdedup.py::near_dup_against_index): seed the band
    index with the whole documents table, then run one batch holding
    (a) the same injected mutations as dedup_minhash_recall — id + 1M,
    'extra tail token' appended, for every doc_id % 8 == 0 — which must
    be FLAGGED (>= 95%), and (b) word-disjoint synthetic docs (id + 3M
    for doc_id % 8 == 1) which must be ACCEPTED (>= 95%).  Oracle emits
    the injected count and TRUE/TRUE, hash-matching iff both bars held."""
    from tokcodec.functions.incdedup import near_dup_against_index

    idx = _scratch_dir("incmh", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    near_dup_against_index(ds, idx, run_id="seed")

    def _mk_batch(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        muts = t.filter(pa.array(did % 8 == 0))
        fresh = t.filter(pa.array(did % 8 == 1))
        fresh_ids = fresh.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "doc_id": pc.add(muts.column("doc_id"), 1_000_000),
                        "text": pc.binary_join_element_wise(
                            muts.column("text"), pa.scalar("extra tail token"), " "
                        ),
                    }
                ),
                pa.table(
                    {
                        "doc_id": pc.add(fresh.column("doc_id"), 3_000_000),
                        "text": pa.array(
                            [
                                " ".join(f"f{i}_{j}" for j in range(20))
                                for i in fresh_ids
                            ],
                            pa.string(),
                        ),
                    }
                ),
            ]
        )

    batch = ds.map_batches(_mk_batch, batch_format="pyarrow")
    acc = near_dup_against_index(batch, idx, run_id="b1")

    # Aggregate-shaped scoring (no driver-side id sets — the accepted
    # list is O(corpus)): union the EXPECTED ids (kind-tagged, derived
    # per block from documents) with the ACCEPTED ids, fold per doc_id
    # with one sort-based reduce, then per-block partial sums; only the
    # O(blocks) 4-column partials reach the driver.
    def _expected(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        inj = did[did % 8 == 0] + 1_000_000
        fr = did[did % 8 == 1] + 3_000_000
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([inj, fr]), pa.int64()),
                "inj": pa.array(
                    np.r_[np.ones(len(inj), np.int8), np.zeros(len(fr), np.int8)]
                ),
                "fr": pa.array(
                    np.r_[np.zeros(len(inj), np.int8), np.ones(len(fr), np.int8)]
                ),
                "acc": pa.array(np.zeros(len(inj) + len(fr), np.int8)),
            }
        )

    def _accepted(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "inj": pa.array(np.zeros(n, np.int8)),
                "fr": pa.array(np.zeros(n, np.int8)),
                "acc": pa.array(np.ones(n, np.int8)),
            }
        )

    marks = ds.select_columns(["doc_id"]).map_batches(
        _expected, batch_format="pyarrow"
    ).union(acc.map_batches(_accepted, batch_format="pyarrow"))
    per_doc = sorted_group_reduce(
        marks,
        ["doc_id"],
        [("inj", "max", "inj"), ("fr", "max", "fr"), ("acc", "max", "acc")],
    )

    def _partial(t: pa.Table) -> pa.Table:
        inj = t.column("inj").to_numpy(zero_copy_only=False).astype(bool)
        fr = t.column("fr").to_numpy(zero_copy_only=False).astype(bool)
        a = t.column("acc").to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "n_inj": pa.array([int(inj.sum())], pa.int64()),
                "n_flagged": pa.array([int((inj & ~a).sum())], pa.int64()),
                "n_fr": pa.array([int(fr.sum())], pa.int64()),
                "n_acc_fr": pa.array([int((fr & a).sum())], pa.int64()),
            }
        )

    parts = per_doc.map_batches(_partial, batch_format="pyarrow").take_all()
    n_inj = sum(p["n_inj"] for p in parts)
    n_flagged = sum(p["n_flagged"] for p in parts)
    n_fr = sum(p["n_fr"] for p in parts)
    n_acc_fr = sum(p["n_acc_fr"] for p in parts)
    return pa.table(
        {
            "n_injected": pa.array([n_inj], pa.int64()),
            "flagged_ok": pa.array(
                [n_inj > 0 and n_flagged / n_inj >= 0.95], pa.bool_()
            ),
            "accept_ok": pa.array(
                [n_fr > 0 and n_acc_fr / n_fr >= 0.95], pa.bool_()
            ),
        }
    )


def _dedup_incremental_oracle_sql() -> str:
    return (
        "WITH existing AS (SELECT doc_id, text FROM documents WHERE n_chars % 3 <> 0), "
        "newbase AS (SELECT doc_id, text FROM documents WHERE n_chars % 3 = 0), "
        "echoes AS (SELECT doc_id + 1000000 AS doc_id, text FROM existing WHERE doc_id % 5 = 0), "
        "selfdup AS (SELECT doc_id + 2000000 AS doc_id, text FROM newbase WHERE doc_id % 7 = 0), "
        "newb AS (SELECT * FROM newbase UNION ALL SELECT * FROM echoes "
        "UNION ALL SELECT * FROM selfdup) "
        "SELECT MIN(doc_id) AS doc_id FROM newb "
        "WHERE text NOT IN (SELECT text FROM existing) GROUP BY text"
    )


# --------------------------------------------------- sequence packing ----

PACK_SEQ_LEN = 512


def pack_chunks_documents(sf_dir: str):
    """Concat-and-chunk sequence packing (pipelines/pack.py) over the
    tokenized documents table, surfaced as chunk metadata so DuckDB can
    verify the packing layout exactly: per chunk, its token count, the
    number of documents overlapping it, and the first/last doc id.
    Tokenize runs distributed; the tokenized table is sorted and staged
    to partitioned parquet entirely inside Ray (write_parquet with
    preserve_order, so lexicographic file order == sorted block order ==
    the pack plan's global scan order) — the driver never holds the
    corpus; the pack itself is the distributed planned pipeline under
    test."""

    import ray.data

    from tokcodec.pipelines import pack as packmod

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    # tokenize emits the north-rule doc_id:string — cast back to int64
    # BEFORE sorting so the global order is numeric like the oracle's
    tok = (
        ds.map_batches(text.tokenize, batch_format="pyarrow")
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                pc.cast(t.column("doc_id"), pa.int64()),
            ),
            batch_format="pyarrow",
        )
        .sort("doc_id")
    )
    tmp = _scratch_dir("pack", sf_dir)
    ctx = ray.data.DataContext.get_current()
    prev_order = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        tok.select_columns(["doc_id", "tokens", "n_tok"]).write_parquet(
            f"{tmp}/staged", row_group_size=64
        )
    finally:
        ctx.execution_options.preserve_order = prev_order
    res = packmod.pack_dataset(
        f"{tmp}/staged",
        f"{tmp}/out",
        seq_len=PACK_SEQ_LEN,
        target_tokens=4096,  # force many partitions -> stitching on the oracle path
    )
    out = packmod.read_packed(f"{tmp}/out")
    return out.map_batches(
        lambda t: pa.table(
            {
                "chunk_id": pc.cast(t.column("chunk_id"), pa.int64()),
                "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
                "first_doc": pc.cast(t.column("first_doc"), pa.int64()),
                "last_doc": pc.cast(t.column("last_doc"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _pack_oracle_sql() -> str:
    L = PACK_SEQ_LEN
    return (
        "WITH toks AS ("
        "  SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n"
        "  FROM documents), "
        "ord AS ("
        "  SELECT doc_id, n,"
        "         CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s,"
        "         CAST(SUM(n) OVER (ORDER BY doc_id) AS BIGINT) AS e"
        "  FROM toks), "
        "spans AS ("
        "  SELECT o.doc_id, gs.c AS chunk_id,"
        f"         LEAST(o.e, (gs.c + 1) * {L}) - GREATEST(o.s, gs.c * {L}) AS overlap"
        f"  FROM ord o, LATERAL (SELECT unnest(generate_series(o.s // {L}, (o.e - 1) // {L}))) AS gs(c)"
        "  WHERE o.n > 0) "
        "SELECT chunk_id, CAST(SUM(overlap) AS BIGINT) AS n_tok,"
        "       CAST(COUNT(*) AS BIGINT) AS n_docs,"
        "       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc "
        "FROM spans GROUP BY chunk_id"
    )


def point_lookup_documents(sf_dir: str):
    """Bloom-filter point lookup on OUR OWN format: encode documents
    into TOKB blocks with a doc_id bloom (unsorted layout — min/max
    zone maps CANNOT prune an id lookup here), then decode with
    `doc_id == <min id>`: every non-matching block skips at the header
    read via the bloom probe.  Oracle = the same point lookup in SQL."""
    from tokcodec.pipelines.encode import decode_dataset
    from tokcodec.sources.sink import TokbDatasink

    out = _scratch_dir("bloomq", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    ds.repartition(8).write_datasink(TokbDatasink(out, bloom_cols=["doc_id"]))
    target = (
        _rp(sf_dir, "documents", columns=["doc_id"]).min("doc_id")
    )
    return decode_dataset(out, predicate=col("doc_id") == target)


def compact_roundtrip_documents(sf_dir: str):
    """Compaction on OUR OWN format: encode documents into MANY tiny
    blocks (streaming sink, 16 partitions), compact into one
    target-sized block set, decode.  Oracle = the source table — any
    lost/duplicated/reordered-within-block row breaks the hash."""
    from tokcodec.pipelines.compact import compact_blocks
    from tokcodec.pipelines.encode import decode_dataset
    from tokcodec.sources.sink import TokbDatasink

    tiny = _scratch_dir("cmp_tiny", sf_dir)
    out = _scratch_dir("cmp_out", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    ds.repartition(16).write_datasink(TokbDatasink(tiny))
    compact_blocks(tiny, out, target_tokens=10**12)
    return decode_dataset(out)


def sidecar_quality_documents(sf_dir: str):
    """Sidecar append on OUR OWN format: encode documents (doc_id, text)
    into TOKB blocks, attach a q_words column as a SIDECAR (base blocks
    never rewritten), then read base+sidecar zipped back.  Oracle = the
    same word count in SQL over the source table — any base/sidecar
    misalignment would break the per-row hash."""
    from tokcodec.pipelines.sidecar import append_columns, read_with_sidecars
    from tokcodec.sources.sink import TokbDatasink

    out = _scratch_dir("sidecarq", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    ds.repartition(8).write_datasink(TokbDatasink(out))

    def qcols(t):
        from tokcodec.functions.text import add_quality

        return add_quality(t).select(["q_words"])

    append_columns(out, "q", qcols, input_columns=["doc_id", "text"])
    return read_with_sidecars(out, ["q"], columns=["doc_id", "q_words"])


def repetition_documents(sf_dir: str):
    """Intra-document repetition stats (functions/dedup.py::
    repetition_stats — the Gopher duplicate-n-gram quality filter):
    per doc, total word 3-grams and duplicate count, integer-exact so
    the SQL gram aggregation hashes identically.  Docs with fewer than
    3 words are gated out on BOTH sides: the oracle's
    generate_series(1, len(w)-2) yields no grams for them, while the
    operator's padded-shingle semantics would emit (1, 0) — without
    the gate the row counts diverge on any corpus holding short docs.
    One shuffle-free vectorized map_batches; engine sibling of
    ngram_profile / quality_documents (slot 51+: same per-doc n-gram
    machinery as the visible ngram_profile_documents)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        q = text.add_quality(t).column("q_words").to_numpy(zero_copy_only=False)
        return dedup.repetition_stats(t.filter(pa.array(q >= 3)))

    return ds.map_batches(stats, batch_format="pyarrow")


def _repetition_oracle_sql() -> str:
    return (
        "WITH words AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') "
        "AS w FROM documents), "
        "grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g "
        "FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(COUNT(*) - COUNT(DISTINCT g) AS BIGINT) AS n_dup "
        "FROM grams GROUP BY doc_id"
    )


def curate_documents(sf_dir: str):
    """The end-to-end curation funnel a training corpus actually runs,
    composed from the package's quality ops in ONE streaming pass plus
    the one dedup exchange: language-ID (keep 'en') → word-count floor
    (q_words >= 30) → intra-doc repetition ceiling (duplicate 3-grams
    < 1%, integer form n_dup*100 < n_grams) → exact content dedup
    (MIN id per text).  The three per-doc gates fuse into a single
    vectorized map_batches after the LangId actor stage — a rejected
    doc's text never leaves the first pass — and only survivors reach
    the dedup exchange.  Oracle = the same funnel as nested SQL CTEs
    over the shared deterministic kernels (stopword vote, word rule,
    gram aggregation, GROUP BY text)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    tagged = ds.map_batches(
        text.LangId, batch_format="pyarrow", concurrency=2, num_cpus=1
    )

    def gate(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("lang_pred"), "en"))
        t = t.select(["doc_id", "text"])
        if t.num_rows == 0:
            return t
        q = text.add_quality(t).column("q_words").to_numpy(zero_copy_only=False)
        rep = dedup.repetition_stats(t)
        n_grams = rep.column("n_grams").to_numpy(zero_copy_only=False)
        n_dup = rep.column("n_dup").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((q >= 30) & (n_dup * 100 < n_grams)))

    survivors = tagged.map_batches(gate, batch_format="pyarrow")
    return dedup.exact_dedup(survivors).select_columns(["doc_id"])


def _curate_oracle_sql() -> str:
    lang = langid_documents_oracle()
    return (
        f"WITH lang AS ({lang}), "
        "q AS (SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) "
        "AS q_words FROM documents), "
        "rep AS (WITH words AS (SELECT doc_id, "
        "regexp_extract_all(text, '[A-Za-z0-9]+') AS w FROM documents), "
        "grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g "
        "FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)) "
        "SELECT doc_id, COUNT(*) AS n_grams, "
        "COUNT(*) - COUNT(DISTINCT g) AS n_dup FROM grams GROUP BY doc_id), "
        "keep AS (SELECT d.doc_id, d.text FROM documents d "
        "JOIN lang USING (doc_id) JOIN q USING (doc_id) JOIN rep USING (doc_id) "
        "WHERE lang.lang_pred = 'en' AND q.q_words >= 30 "
        "AND rep.n_dup * 100 < rep.n_grams) "
        "SELECT MIN(doc_id) AS doc_id FROM keep GROUP BY text"
    )


def export_bin_documents(sf_dir: str):
    """Trainer-shard export chain (pipelines/export.py): tokenize →
    TOKB → flat .bin token shards + per-shard parquet indexes; the
    result is a DISTRIBUTED read of the index files, (doc_id, n_tok)
    vs the tokenize SQL.  Token VALUES are pinned bit-exact by
    tests/test_export.py; this oracle pins the index layout (offsets /
    counts / doc coverage) end-to-end.  Slot 51+: the chain shares the
    visible ingest/tokenize-roundtrip engines up to the export sink."""
    import ray.data

    from tokcodec.pipelines.export import export_token_bin
    from tokcodec.sources.sink import TokbDatasink

    tmp = _scratch_dir("exportbin", sf_dir)
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    ds.map_batches(text.tokenize, batch_format="pyarrow").write_datasink(
        TokbDatasink(f"{tmp}/tokb")
    )
    export_token_bin(f"{tmp}/tokb", f"{tmp}/bin")
    import glob

    idx_files = sorted(glob.glob(f"{tmp}/bin/*.idx.parquet"))
    return ray.data.read_parquet(idx_files).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------- benchmark decontamination ----


def decontaminate_documents(sf_dir: str):
    """Benchmark decontamination (functions/dedup.py::flag_contaminated):
    the 'benchmark' is the deterministic doc_id % 17 == 0 slice of
    documents, training = the rest; a training doc is contaminated iff
    it shares >= 1 word 3-gram with any benchmark doc.  Returns
    (doc_id, n_hits), n_hits = the doc's count of distinct contaminated
    3-grams.  The benchmark shingle set folds distributively and
    broadcasts once via ray.put; the training pass is one shuffle-free
    vectorized-membership map_batches.  Oracle = the same gram join in
    SQL (lateral UNNEST(generate_series) over the word arrays —
    value-exact because the shingle word rule is the shared
    [A-Za-z0-9]+ and every testdata doc has >= k words, so the
    short-doc padding path never fires)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_f(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % 17 == 0))

    def train_f(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % 17 != 0))

    return dedup.flag_contaminated(
        ds.map_batches(train_f, batch_format="pyarrow"),
        ds.map_batches(bench_f, batch_format="pyarrow"),
    )


def _decontaminate_oracle_sql() -> str:
    return (
        "WITH words AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') "
        "AS w FROM documents), "
        "grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g "
        "FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)), "
        "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0), "
        "hits AS (SELECT g.doc_id, COUNT(DISTINCT g.g) AS n_hits "
        "FROM grams g JOIN bench b ON g.g = b.g "
        "WHERE g.doc_id % 17 <> 0 GROUP BY g.doc_id) "
        "SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits FROM hits"
    )


# ---------------------------------------------------------- ingestion ----


def ingest_roundtrip_documents(sf_dir: str):
    """Driver-visible oracle for the ingestion pipeline
    (pipelines/ingest.py; VERDICT r4 next #3): the documents table is
    re-exported as JSONL entirely inside Ray (write_json, distributed),
    ingested back through the full jsonl → schema funnel → tokenize →
    TOKB sink path, and the blocks decoded to (doc_id, n_tok).  The
    tokenizer's word rule matches DuckDB's regexp_extract_all, so a
    value-identical n_tok proves the whole ingest chain — format
    reader, column funnel, tokenizer, sink, decoder.  Maps to the
    reference's multi-format reader role
    (ExampleParquetReader.java:18-63); csv/parquet variants are
    token-identical by pytest (tests/test_ingest.py)."""
    from tokcodec.pipelines.encode import decode_dataset
    from tokcodec.pipelines.ingest import ingest_documents

    tmp = _scratch_dir("ingestrt", sf_dir)
    _rp(sf_dir, "documents", columns=["doc_id", "text", "source"]).write_json(
        f"{tmp}/jsonl"
    )
    ingest_documents(f"{tmp}/jsonl", f"{tmp}/tokb", fmt="jsonl")
    dec = decode_dataset(f"{tmp}/tokb", columns=["doc_id", "n_tok"])
    return dec.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ----------------------------------------------------------- catalog ----


def build_queries() -> dict:
    # Ordering contract: the correctness driver records only the FIRST 50
    # entries, so the first 50 are exactly the SQL-oracled queries that
    # exercise distinct capabilities (round 4 swapped docs_stats_by_lang —
    # a multi-agg twin of agg_lineitem_pricing — past the window to make
    # room for vocab_remap_events, predicate_negation_orders — whose
    # NOT path is also pytest-covered and sibling to predicate_or_events —
    # past the window for shuffle_documents, and sample_documents — a
    # hash-threshold twin of split/mix/quota — past the window for
    # dedup_ngram_recall; the round-4 sidecar / bloom point-lookup /
    # compaction queries then displaced predicate_dates_lineitem and
    # predicate_isin_part — date/IN siblings of the three visible
    # predicate queries, pytest-covered, driver-green rounds 1-3 — and
    # quantiles_lineitem_price, whose exact-quantile engine is a strict
    # subset of the visible quantiles_by_lang; late round 4 then swapped
    # dedup_ngram_recall — the char-shingle twin of the visible
    # dedup_minhash_recall, same LSH machinery — and ann_ivf_recall —
    # whose engine is a subset of the visible
    # ann_ivf_partitioned_recall — past the window for the two NEW
    # capabilities dedup_incremental_documents and
    # join_revenue_by_nation.  Round 5 swapped topk_documents — a
    # strict subset of the visible topk_per_source, same grouped-top-k
    # engine with one group — past the window for the near-dup
    # band-index recall bar dedup_incremental_minhash_recall (a
    # distinct capability: band index ≠ exact index), and
    # split_documents — a hash-threshold sibling of the visible
    # mix/quota queries, same salted-hash gate, pytest-covered,
    # driver-green rounds 1-4 — for ingest_roundtrip_documents, the
    # jsonl→tokenize→TOKB→decode chain that was previously
    # pytest-only; and having_orders — a post-aggregation filter whose
    # engine is the visible agg_lineitem_pricing grouped aggregate plus
    # a predicate-family filter — for decontaminate_documents, the NEW
    # benchmark-decontamination capability).  Entries past slot 50 are
    # either rows-only by design (encode_stats) or oracled twins of a
    # visible query (md5-parity dedup, second agg, shuffle-join vs
    # broadcast-join, etc.) — still runnable via tools/check_oracle.py.
    # The raw signature-dump queries from earlier rounds (rolling_hash,
    # minhash / simhash sig lists, raw ann_lsh/ann_ivf top-k) were
    # retired: each is fully covered by its oracled recall-bar twin plus
    # pytest.
    qs = {
        # --- reference surface: roundtrip / projection / predicates ---
        "roundtrip_documents": roundtrip(
            "documents", ["doc_id", "text", "lang", "source", "n_chars"]
        ),
        "roundtrip_lineitem": roundtrip(
            "lineitem",
            ["l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
             "l_extendedprice", "l_returnflag", "l_shipdate"],
        ),
        "roundtrip_embeddings": roundtrip("embeddings", ["vec_id", "embedding", "label"]),
        "tokenize_roundtrip_documents": tokenize_roundtrip_documents,
        "projection_documents": projection_documents,
        "predicate_lineitem": predicate_lineitem,
        "predicate_or_events": predicate_or_events,
        "predicate_tokb_roundtrip": predicate_tokb_roundtrip,
        "predicate_tokb_nested": predicate_tokb_nested,
        "evolution_read_documents": evolution_read_documents,
        "scanner_documents": scanner_documents,
        # --- text analysis ---
        "token_count_documents": token_count_documents,
        "fingerprint_documents": fingerprint_documents,
        "langid_documents": langid_documents,
        "quality_documents": quality_documents,
        "ngram_profile_documents": ngram_profile_documents,
        "tfidf_topk_documents": tfidf_topk_documents,
        "redact_documents": redact_documents,
        # --- aggregates / quantiles / windows ---
        "agg_lineitem_pricing": agg_lineitem_pricing,
        "vocab_remap_events": vocab_remap_events,
        "topk_per_source": topk_per_source,
        "quantiles_by_lang": quantiles_by_lang,
        "approx_quantiles_check": approx_quantiles_check,
        "window_events": window_events,
        "sessionize_events": sessionize_events,
        "distinct_users_hll": distinct_users_hll,
        # --- joins ---
        "join_lineitem_orders": join_lineitem_orders,
        "asof_join_events_orders": asof_join_events_orders,
        "band_join_events": band_join_events,
        "antijoin_customers": antijoin_customers,
        # --- dedup ---
        "dedup_exact_fnv_documents": dedup_exact_fnv_documents,
        "dedup_minhash_recall": dedup_minhash_recall,
        "dedup_incremental_documents": dedup_incremental_documents,  # index-backed incremental dedup
        "dedup_incremental_minhash_recall": dedup_incremental_minhash_recall,  # near-dup band index
        "dedup_simhash_recall": dedup_simhash_recall,
        "embedding_dups": embedding_dups,
        "decontaminate_documents": decontaminate_documents,  # benchmark decontamination
        # --- ANN ---
        "ann_bruteforce": ann_bruteforce,
        "ann_lsh_recall": ann_lsh_recall,
        "ann_ivf_partitioned_recall": ann_ivf_partitioned_recall,
        "join_revenue_by_nation": join_revenue_by_nation,  # star join, broadcast dims
        # --- corpus mixing / packing / multimodal ---
        "mix_documents": mix_documents,
        "quota_documents": quota_documents,
        "pack_chunks_documents": pack_chunks_documents,
        "multimodal_features": multimodal_features,
        "shuffle_documents": shuffle_documents,
        # --- round-4 block layer: sidecar append / bloom lookup / compaction ---
        "sidecar_quality_documents": sidecar_quality_documents,  # column append, no rewrite
        "point_lookup_documents": point_lookup_documents,  # bloom block skipping
        "compact_roundtrip_documents": compact_roundtrip_documents,  # small-files merge
        # --- round-5: ingestion ---
        "ingest_roundtrip_documents": ingest_roundtrip_documents,  # jsonl -> TOKB chain
        # ---- slot 51+: outside the driver's CORRECTNESS window ----
        "encode_stats_documents": encode_stats("documents"),  # rows-only by design
        "having_orders": having_orders,  # post-agg filter: grouped-agg engine of agg_lineitem + predicate-family filter
        "topk_documents": topk_documents,  # one-group subset of topk_per_source
        "split_documents": split_documents,  # hash-threshold twin of mix/quota/sample
        "sample_documents": sample_documents,  # hash-threshold twin of split/mix/quota
        "dedup_exact_documents": dedup_exact_documents,  # md5-parity twin of _fnv
        "agg_events_by_type": agg_events_by_type,
        "shuffle_join_lineitem_orders": shuffle_join_lineitem_orders,
        "distinct_langs": distinct_langs,
        "wordcount_topk_documents": wordcount_topk_documents,
        "multimodal_meta_documents": multimodal_meta_documents,
        "docs_stats_by_lang": docs_stats_by_lang,  # agg twin of agg_lineitem_pricing
        "predicate_negation_orders": predicate_negation_orders,  # NOT: pytest + OR twin
        "predicate_dates_lineitem": predicate_dates_lineitem,  # date twin of visible predicates
        "predicate_isin_part": predicate_isin_part,  # IN-list twin of visible predicates
        "quantiles_lineitem_price": quantiles_lineitem_price,  # subset of quantiles_by_lang
        "dedup_ngram_recall": dedup_ngram_recall,  # char-shingle twin of dedup_minhash_recall
        "ann_ivf_recall": ann_ivf_recall,  # subset of ann_ivf_partitioned_recall
        "repetition_documents": repetition_documents,  # Gopher dup-ngram quality signal (ngram_profile sibling)
        "export_bin_documents": export_bin_documents,  # trainer .bin/.idx shard export chain
        "curate_documents": curate_documents,  # composed funnel: langid+quality+repetition+dedup
    }
    return qs


def build_oracle_sql() -> dict:
    return {
        "roundtrip_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "roundtrip_lineitem": (
            "SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_returnflag, l_shipdate FROM lineitem"
        ),
        "roundtrip_embeddings": "SELECT vec_id, embedding, label FROM embeddings",
        "tokenize_roundtrip_documents": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
            " AS n_tok FROM documents"
        ),
        "projection_documents": "SELECT doc_id, lang FROM documents",
        "predicate_lineitem": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem "
            "WHERE l_quantity > 30.0 AND l_discount <= 0.05"
        ),
        "predicate_or_events": (
            "SELECT event_id, event_type, value FROM events "
            "WHERE event_type = 'click' OR value > 90.0"
        ),
        "predicate_dates_lineitem": (
            "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem "
            "WHERE l_shipdate < TIMESTAMP '1995-06-01'"
        ),
        "predicate_isin_part": (
            "SELECT p_partkey, p_brand FROM part WHERE p_brand IN ('Brand#1', 'Brand#2')"
        ),
        "predicate_negation_orders": (
            "SELECT o_orderkey, o_orderstatus FROM orders WHERE NOT o_orderstatus = 'F'"
        ),
        "predicate_tokb_roundtrip": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey < 1000"
        ),
        "predicate_tokb_nested": (
            "SELECT doc_id, n_chars AS size FROM documents WHERE n_chars > 500"
        ),
        "evolution_read_documents": (
            "SELECT doc_id, n_chars, CAST(NULL AS BIGINT) AS extra FROM documents"
        ),
        "scanner_documents": scanner_documents_oracle(),
        "token_count_documents": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
            " AS n_words FROM documents"
        ),
        "fingerprint_documents": "SELECT doc_id, md5(text) AS fp FROM documents",
        "langid_documents": langid_documents_oracle(),
        "quality_documents": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
            " AS q_words FROM documents"
        ),
        "docs_stats_by_lang": (
            # CAST: DuckDB SUM(BIGINT) yields HUGEINT which the driver
            # hashes as float64; Ray returns int64 — keep dtypes aligned
            "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY lang"
        ),
        "sidecar_quality_documents": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)"
            " AS q_words FROM documents"
        ),
        "point_lookup_documents": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE doc_id = (SELECT min(doc_id) FROM documents)"
        ),
        "compact_roundtrip_documents": (
            "SELECT doc_id, lang, n_chars FROM documents"
        ),
        "agg_lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
            "SUM(l_quantity) AS sum_qty, MAX(l_extendedprice) AS max_price, "
            "MIN(l_extendedprice) AS min_price "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "agg_events_by_type": (
            "SELECT event_type, COUNT(*) AS n, MAX(value) AS max_value, "
            "MIN(value) AS min_value FROM events GROUP BY event_type"
        ),
        "topk_documents": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "quantiles_lineitem_price": (
            "SELECT 0.5 AS q, quantile_disc(l_extendedprice, 0.5) AS v FROM lineitem "
            "UNION ALL SELECT 0.9, quantile_disc(l_extendedprice, 0.9) FROM lineitem "
            "UNION ALL SELECT 0.99, quantile_disc(l_extendedprice, 0.99) FROM lineitem"
        ),
        "quantiles_by_lang": _quantiles_by_lang_oracle_sql(),
        "approx_quantiles_check": _approx_quantiles_oracle_sql(),
        "dedup_incremental_documents": _dedup_incremental_oracle_sql(),
        "join_revenue_by_nation": _join_revenue_oracle_sql(),
        "dedup_incremental_minhash_recall": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_injected, TRUE AS flagged_ok, "
            "TRUE AS accept_ok FROM documents WHERE doc_id % 8 = 0"
        ),
        "ingest_roundtrip_documents": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) "
            "AS BIGINT) AS n_tok FROM documents"
        ),
        "decontaminate_documents": _decontaminate_oracle_sql(),
        "repetition_documents": _repetition_oracle_sql(),
        "export_bin_documents": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) "
            "AS BIGINT) AS n_tok FROM documents"
        ),
        "curate_documents": _curate_oracle_sql(),
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "wordcount_topk_documents": (
            "SELECT w AS word, COUNT(*) AS n FROM (SELECT "
            "unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS w "
            "FROM documents) GROUP BY w ORDER BY n DESC, word LIMIT 20"
        ),
        "tfidf_topk_documents": _tfidf_oracle_sql(),
        "redact_documents": _redact_oracle_sql(),
        "window_events": (
            "SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win, "
            "COUNT(*) AS n FROM events GROUP BY event_type, win"
        ),
        "sessionize_events": (
            "WITH gaps AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
            "FROM events), sess AS (SELECT user_id, "
            "CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM gaps) "
            "SELECT user_id, session_id, COUNT(*) AS n_events FROM sess "
            "GROUP BY user_id, session_id"
        ),
        "join_lineitem_orders": (
            "SELECT o_orderpriority, COUNT(*) AS n FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
        ),
        "shuffle_join_lineitem_orders": (
            "SELECT o_orderpriority, COUNT(*) AS n FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
        ),
        "asof_join_events_orders": (
            "SELECT e.event_id, o.o_orderdate FROM events e ASOF JOIN orders o "
            "ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts"
        ),
        "band_join_events": (
            "SELECT e1.event_id, COUNT(*) AS n FROM events e1 JOIN events e2 "
            "ON e1.user_id = e2.user_id AND e2.ts >= e1.ts - INTERVAL 1 HOUR "
            "AND e2.ts <= e1.ts + INTERVAL 1 HOUR GROUP BY e1.event_id"
        ),
        "distinct_users_hll": (
            "SELECT COUNT(DISTINCT user_id) AS n_exact, true AS ok FROM events"
        ),
        "embedding_dups": (
            "WITH both_sides AS (SELECT vec_id, embedding FROM embeddings "
            "UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding "
            "FROM embeddings WHERE vec_id % 16 = 0) "
            "SELECT x.vec_id AS a, y.vec_id AS b FROM both_sides x "
            "JOIN both_sides y ON x.vec_id < y.vec_id "
            "AND list_cosine_similarity(x.embedding, y.embedding) >= 0.999"
        ),
        "having_orders": (
            "SELECT o_custkey, COUNT(*) AS n FROM orders "
            "GROUP BY o_custkey HAVING COUNT(*) > 5"
        ),
        "antijoin_customers": (
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
        ),
        "dedup_exact_documents": (
            "SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"
        ),
        "dedup_exact_fnv_documents": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "dedup_minhash_recall": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_injected, TRUE AS recall_ok "
            "FROM documents WHERE doc_id % 8 = 0"
        ),
        "dedup_ngram_recall": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_injected, TRUE AS recall_ok "
            "FROM documents WHERE doc_id % 8 = 0"
        ),
        "dedup_simhash_recall": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_injected, TRUE AS recall_ok "
            "FROM documents WHERE doc_id % 8 = 0"
        ),
        "multimodal_features": (
            "SELECT CAST(doc_id AS VARCHAR) AS media_id, "
            + ", ".join(
                f"CAST((md5_number_upper(text) >> {8 * j}) & 255 AS DOUBLE)"
                f" / 256.0 AS f{j}"
                for j in range(8)
            )
            + ", octet_length(CAST(text AS BLOB)) AS payload_bytes FROM documents"
        ),
        "ngram_profile_documents": (
            "SELECT doc_id, CAST(CASE WHEN length(s) <= 4 THEN 1 "
            "ELSE len(list_distinct(list_transform(range(1, length(s) - 2), "
            "i -> substring(s, i, 4)))) END AS BIGINT) AS n_grams "
            "FROM (SELECT doc_id, coalesce(text, '') AS s FROM documents)"
        ),
        "multimodal_meta_documents": (
            "SELECT doc_id, octet_length(CAST(text AS BLOB)) AS payload_bytes FROM documents"
        ),
        "ann_bruteforce": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings "
            "WHERE vec_id IN (0, 1, 2)), "
            "scored AS (SELECT q.qid AS query, e.vec_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            "list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id) AS rk "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT query, vec_id FROM scored WHERE rk <= 5"
        ),
        # recall bars: the oracle lists every query id; the Ray side
        # returns only ids whose recall@5 >= 0.6 — equal iff all pass
        "ann_lsh_recall": (
            "SELECT vec_id AS query FROM embeddings WHERE vec_id IN (0, 1, 2)"
        ),
        "ann_ivf_recall": (
            "SELECT vec_id AS query FROM embeddings WHERE vec_id IN (0, 1, 2)"
        ),
        "ann_ivf_partitioned_recall": (
            "SELECT vec_id AS query FROM embeddings WHERE vec_id IN (0, 1, 2)"
        ),
        "sample_documents": _sample_oracle_sql(),
        "mix_documents": _mix_oracle_sql(),
        "split_documents": _split_oracle_sql(),
        "quota_documents": _quota_oracle_sql(),
        "topk_per_source": _topk_per_source_oracle_sql(),
        "pack_chunks_documents": _pack_oracle_sql(),
        "vocab_remap_events": _vocab_remap_oracle_sql(),
        "shuffle_documents": _shuffle_oracle_sql(),
    }
