"""Text-analysis operators for LLM training-data pipelines (driver brief:
language-ID, quality scoring, token counting, document fingerprinting).

Beyond the reference surface (it has no document processing), designed on
the same principle as ops/clean.py: every operator is a native Column
expression over the ``documents`` table — no Python UDFs, so a 100 TB text
corpus stays inside whole-stage codegen with zero serialization cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokens(c: Column) -> Column:
    """Whitespace tokenization (any run of whitespace splits; empty tokens
    dropped — a single-space split would fuse newline/tab-separated words
    and corrupt every token-derived statistic downstream)."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != "")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


#: BPE-ish lexer: alpha runs, digit runs, single non-alnum marks — a cheap
#: deterministic stand-in for subword token counting.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_token_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def char_stats(c: Column) -> dict[str, Column]:
    """Per-document character profile (one pass, all codegen)."""
    n = F.length(c)
    return {
        "n_chars": n,
        "n_punct": F.regexp_count(c, F.lit(r"[.,!?;:]")),
        "n_digits": F.regexp_count(c, F.lit("[0-9]")),
        "n_upper": F.regexp_count(c, F.lit("[A-Z]")),
    }


#: Minimal per-language stopword lists for the n-gram/stopword-hit
#: language heuristic. Order = tie-break priority.
LANG_STOPWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")),
    ("es", ("el", "la", "de", "y", "que", "en", "los", "se", "del", "por")),
    ("de", ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu")),
    ("fr", ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est")),
)


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Count of token OCCURRENCES (not distinct) that are in ``words``."""
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit, t)))


def language_id(c: Column) -> Column:
    """Stopword-hit argmax heuristic; 'und' (undetermined) when no list
    scores a single hit. Ties resolve in LANG_STOPWORDS order."""
    toks = tokens(c)
    scores = {lang: stopword_hits(toks, words) for lang, words in LANG_STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang, _ in reversed(LANG_STOPWORDS):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def stopword_ratio(c: Column) -> Column:
    """Share of token occurrences that are (any-language) stopwords."""
    toks = tokens(c)
    all_words = tuple({w for _, ws in LANG_STOPWORDS for w in ws})
    hits = stopword_hits(toks, tuple(sorted(all_words)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks))


def quality_score(c: Column) -> Column:
    """Composite 0..1 heuristic: reward reasonable length and natural
    stopword density, penalize punctuation soup. Weights are engine policy
    (documented, deterministic), not learned."""
    stats = char_stats(c)
    n_toks = token_count(c)
    punct_ratio = F.when(
        stats["n_chars"] > 0, stats["n_punct"].cast("double") / stats["n_chars"]
    ).otherwise(F.lit(0.0))
    length_score = F.least(n_toks.cast("double") / 100.0, F.lit(1.0))
    stop_score = F.coalesce(stopword_ratio(c), F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))
    return F.round(0.4 * length_score + 0.4 * stop_score + 0.2 * punct_score, 6)


def normalize_for_fingerprint(c: Column) -> Column:
    """Whitespace-collapse + lowercase + trim — the canonical form two
    near-identical documents share."""
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def fingerprint_md5(c: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_for_fingerprint(c))


def winnow_fingerprints(df, *, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting").

    Every window of ``w`` consecutive word-``k``-gram hashes contributes
    its minimum hash; the distinct set of selected hashes is the
    document's fingerprint. The winnowing guarantee: any run of
    ``w + k - 1`` shared words between two documents selects at least one
    common fingerprint — the property overlap/plagiarism detection and
    partial-dup mining rely on, at ~1/w the density of the full gram set.

    Hashes are md5 hex strings ordered lexicographically, NOT xxhash64:
    md5 is the one hash both engines share, so the DuckDB oracle can
    reproduce fingerprints bit-for-bit (hex is lowercase ASCII on both,
    so min/sort orderings agree). Documents with fewer than ``w`` grams
    contribute their single clamped window (min over what exists).

    Scale: the gram explode is map-side; the one shuffle is the
    doc-partitioned position window (pos is unique per doc — total order,
    deterministic at any parallelism); the fingerprint-set aggregate
    partial-combines map-side. No joins, no cartesian anything.

    Returns one row per document: (id_col, n_fingerprints, fp_digest)
    where fp_digest = md5 of the ','-joined ascending fingerprint set.
    """
    return (
        winnow_fp_rows(df, id_col=id_col, text_col=text_col, k=k, w=w)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("fp")).alias("__fps"))
        .select(
            F.col(id_col),
            F.size("__fps").alias("n_fingerprints"),
            F.md5(F.concat_ws(",", F.col("__fps"))).alias("fp_digest"),
        )
    )


def winnow_fp_rows(df, *, id_col: str = "doc_id", text_col: str = "text",
                   k: int = 3, w: int = 4):
    """The (id, fp) DISTINCT selected-fingerprint rows behind
    :func:`winnow_fingerprints` — factored out so pair mining can join
    on raw fingerprints while the digest query keeps its aggregate
    surface (both derive from the identical selection)."""
    from pyspark.sql import Window

    from dynamic_etl_spark.ops.lsh import word_gram_seq

    g = df.select(
        F.col(id_col),
        F.posexplode(word_gram_seq(F.col(text_col), k)).alias("pos", "gram"),
    ).withColumn("h", F.md5("gram"))
    part = Window.partitionBy(id_col)
    frame = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        g.withColumn("n_grams", F.count(F.lit(1)).over(part))
        .withColumn("fp", F.min("h").over(frame))
        # full windows only (plus the clamped single window when n < w)
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - w, F.lit(0)))
        .select(id_col, "fp")
        .distinct()
    )


def winnow_overlap_pairs(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
):
    """MOSS-style copy detection between documents (Schleimer et al.
    SIGMOD'03 §5 — their deployed service matches documents BY shared
    winnowing fingerprints): every unordered pair sharing at least
    ``min_shared`` selected fingerprints, with containment ratios
    against each side's fingerprint set. The partial-overlap complement
    to whole-document near-dup (MinHash estimates global resemblance;
    shared winnowed substrings localize COPIED RUNS — any shared run of
    ``w + k - 1`` words is guaranteed to surface at least one shared
    fingerprint).

    ``max_df`` drops fingerprints appearing in more than that many
    documents BEFORE pairing — the boilerplate guard: a footer selected
    in 10k docs would otherwise contribute ~10k²/2 candidate pairs by
    itself (the same hot-key argument as the LSH band-width rule in
    SCALE.md). The dropped fingerprints still count in each doc's
    ``n_fingerprints`` denominator, so containment stays a property of
    the DOCUMENT, not of the cap.

    Plan: fingerprint rows once -> per-fp document frequency (one agg
    on the fp key) -> self-join ONLY on surviving fingerprints
    (candidate volume tracks genuine sharing, never corpus²) -> pair
    count agg -> two broadcast-size joins back to per-doc totals.
    Ratios divide two exact integers once (IEEE-identical per engine).
    Output: (id_a, id_b, shared_fps, containment_a, containment_b),
    id_a < id_b.
    """
    # fps has THREE consumers (totals, dfreq, the pair self-join), each
    # of which would re-run the fingerprint pass — explode + per-doc
    # window min + distinct, the operator's most expensive stage — and
    # unlike the banded-LSH merge the consumers exchange by DIFFERENT
    # keys (id vs fp), so ReusedExchange cannot serve them from one
    # pass. localCheckpoint materializes it once (r13, A/B at sf0.1:
    # 3.5s -> 2.7s; surfaced plan sheds the duplicated fingerprint
    # subtrees). The checkpointed rows are (id, fp) — a fraction of the
    # input text's bytes at any scale (one fingerprint per w-window).
    fps = winnow_fp_rows(
        df, id_col=id_col, text_col=text_col, k=k, w=w
    ).localCheckpoint()
    totals = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    joinable = fps
    if max_df is not None:
        dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
        joinable = fps.join(
            dfreq.filter(F.col("__df") <= max_df).select("fp"), on="fp"
        )
    a = joinable.select(F.col(id_col).alias("id_a"), "fp")
    b = joinable.select(F.col(id_col).alias("id_b"), "fp")
    pairs = (
        a.join(b, on="fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    na = totals.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = totals.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_fps",
            F.round(F.col("shared_fps") / F.col("__na"), 6).alias("containment_a"),
            F.round(F.col("shared_fps") / F.col("__nb"), 6).alias("containment_b"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token windows — the context-window
    preprocessing step between cleaning and sequence packing: a training
    pipeline needs bounded-length samples, and ``stride < chunk_tokens``
    keeps ``chunk_tokens - stride`` tokens of overlap so no boundary
    context is lost. Emits (id, chunk_idx, chunk_text, n_chunk_tokens);
    windows start at every ``stride`` tokens while any token remains, so
    the tail chunk may be short; zero-token documents emit no chunks.

    Scale: chunking is row-local fan-out (explode of a per-doc start
    list) — no shuffle at all; downstream packing/dedup shuffles see
    chunk-sized rows. The slice/concat run per emitted chunk, not per
    start x token (the explode happens before the heavy expressions).
    """
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    exploded = (
        docs.filter(F.size(toks) > 0)
        .select(F.col(id_col), toks.alias("__toks"), F.posexplode(starts).alias("__i", "__start"))
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("__i").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


def vocab_build(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    max_vocab: int = 10_000,
) -> DataFrame:
    """Corpus vocabulary: the ``max_vocab`` most frequent tokens with
    ``count >= min_count``, assigned dense ids 1..K by (count DESC,
    token ASC) — the deterministic total order makes the id assignment
    reproducible at any parallelism (a bare count-ordered row_number
    splits ties by partition order). Emits (token, n, vocab_id).

    Scale: token counts are one explode + partial-agg shuffle; the top-K
    selection is a sort-LIMIT (Spark's TakeOrderedAndProject: each
    partition keeps its own top ``max_vocab``, one bounded merge — the
    WindowGroupLimit rank-pushdown does NOT fire on unpartitioned
    windows, measured, so a row_number-then-filter would sort the whole
    token space). Only the max_vocab-row survivor set goes through the
    single-partition numbering window — the adjudicated bounded-window
    pattern.
    """
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(max_vocab)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return counts.select(
        "token", "n", F.row_number().over(w).cast("long").alias("vocab_id")
    )


#: Common named HTML entities worth decoding in web corpora; numeric
#: entities are dropped (decoding them needs chr(), out of codegen reach).
#: ``&amp;`` decodes LAST: it escapes a literal ampersand, so decoding it
#: first would double-decode — ``&amp;lt;`` must yield the visible text
#: ``&lt;``, not ``<`` (review r4 finding).
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
)


def strip_markup(c: Column) -> Column:
    """Web-corpus markup cleaning, all codegen: HTML tags -> space (a
    space, not empty — ``</p>word`` must not fuse words), named entities
    decoded, numeric entities dropped, whitespace collapsed + trimmed.
    Patterns are regex-dialect-neutral (no lookaround), so the DuckDB
    oracle twin uses the SAME expressions. Ordering is load-bearing
    twice over: entity decode runs AFTER tag removal (``&lt;b&gt;``
    decodes to literal ``<b>`` text and must NOT then be re-stripped as
    a tag), and ``&amp;`` decodes after EVERY other entity rule — it
    escapes a literal ampersand, so decoding it earlier double-decodes
    (``&amp;lt;`` must yield the visible text ``&lt;``, not ``<``)."""
    out = F.regexp_replace(c, r"<[^>]*>", " ")
    for entity, repl in _HTML_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(repl))
    out = F.regexp_replace(out, r"&#[0-9]+;", "")
    out = F.replace(out, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _mojibake(s: str) -> str:
    """The UTF-8 bytes of ``s`` mis-decoded as cp1252 — exactly how the
    artifact is born in a real feed (a UTF-8 file read with a legacy
    codec, then re-encoded), so the repair table is COMPUTED from the
    phenomenon, never hand-typed (a typo'd artifact would silently never
    match)."""
    return s.encode("utf-8").decode("cp1252")


#: Smart-punctuation normalization targets (ASCII): applied both to the
#: mojibake artifact of each char and to the char itself when it appears
#: natively.
_SMART_PUNCT = {
    "‘": "'",
    "’": "'",
    "“": '"',
    "”": '"',
    "–": "-",
    "—": "-",
    "…": "...",
}

#: (artifact, repaired) pairs. ORDER IS LOAD-BEARING three times over:
#: (1) 3-char punctuation mojibake first — the en/em-dash artifacts END
#: in native smart-quote chars (cp1252 0x93/0x94 are U+201C/U+201D), so
#: the bare smart-quote rules would mangle them if they ran first;
#: (2) the a-grave artifact ends in U+00A0, so accent repairs run before
#: the bare-nbsp rule; (3) bare nbsp last. U+201D's artifact is skipped:
#: its third byte (0x9D) is undefined in cp1252 — that artifact cannot
#: arise from a cp1252 round-trip (the native char is still normalized).
#: Repairs are idempotent by construction: no repaired output contains
#: any artifact (pinned by the pytest repair(repair(x)) == repair(x)).
ENCODING_REPAIR_PAIRS: tuple[tuple[str, str], ...] = tuple(
    [
        (_mojibake(ch), ascii_)
        for ch, ascii_ in _SMART_PUNCT.items()
        if ch != "”"
    ]
    + [(_mojibake(ch), ch) for ch in "éèäöüñçáóúà"]
    + [(_mojibake("\u00a0"), " ")]
    + list(_SMART_PUNCT.items())
    + [("\u00a0", " ")]
)


def repair_encoding(c: Column) -> Column:
    """Mojibake / encoding repair (ADVICE r7 next-round #5): undo
    double-encoded UTF-8 (cp1252 mis-decode artifacts: ``Ã©`` -> ``é``,
    ``â€œ`` -> ``"``), normalize smart punctuation to ASCII, and collapse
    non-breaking spaces — the common real-corpus cleaning gate before
    tokenization. A pure codegen ``replace`` chain over the pinned
    ordered pair table (the strip_markup convention), mirrored verbatim
    in SQL by :func:`sql_repair_encoding` so the profile query is fully
    oracle-checkable."""
    out = c
    for bad, good in ENCODING_REPAIR_PAIRS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def sql_repair_encoding(expr: str) -> str:
    """DuckDB twin of :func:`repair_encoding`: the same ordered replace
    chain generated from the same pair table (single-source, like the
    MinHash affine constants)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    for bad, good in ENCODING_REPAIR_PAIRS:
        expr = f"replace({expr}, '{q(bad)}', '{q(good)}')"
    return expr


#: URL matcher, written in the Java-regex ∩ RE2 subset (no lookaround,
#: no backrefs) so Spark and DuckDB match IDENTICAL spans.
URL_PATTERN = r"https?://[^\s]+|www\.[^\s]+"

#: Host part of a URL: optional scheme, then everything up to the first
#: /, ?, or #. Also in the common regex subset.
_HOST_PATTERN = r"^(?:https?://)?([^/?#]+)"


def extract_urls(c: Column) -> Column:
    """All URL spans in a text column (scheme'd or bare www.)."""
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)


def url_domain(u: Column) -> Column:
    """Registrable-ish domain of one URL: lowercased host with a leading
    ``www.`` stripped — the key a blocklist matches on."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(u, _HOST_PATTERN, 1)), r"^www\.", ""
    )


def blocked_url_pattern(domains: tuple[str, ...]) -> str:
    """ONE scrub regex matching any URL whose domain is blocklisted,
    generated from the same domain tuple the counting side uses (the
    encoding-repair single-source rule). Anchored on the scheme/www
    prefix instead of lookbehind (RE2 — hence DuckDB — has none), which
    every URL_PATTERN match has by construction. Case-insensitive
    (``(?i)``, in both Java regex and RE2) because the counting side
    lowercases the host — a mixed-case blocked URL must scrub exactly
    when it counts (caught by the hand-example pytest).

    The host must END at the blocked domain for the counting side's
    exact ``isin`` match to fire, so the scrub mirrors both span
    boundaries without lookaround (RE2 has none) by CONSUMING them:
    start-of-text or one whitespace char before the scheme/www prefix
    (so the pattern cannot enter mid-host — ``www.www.<domain>`` does
    not count and must not scrub), and after the domain either a
    ``[/?#]``-introduced tail or nothing, then one whitespace char or
    end-of-text. Callers therefore replace with ``' '`` (not ``''``)
    and whitespace-normalize after — :func:`scrub_blocked_urls` bundles
    that contract. A host that merely STARTS with the domain
    (``ads.tracker.example.evil.com``, ``...example:8080``) is neither
    counted nor scrubbed. Known corner: a chain of blocked URLs
    separated by single spaces scrubs alternate members per
    application (the consumed trailing space is the next match's
    leading boundary) — counts stay correct, and the fixture/corpus
    never produce adjacent blocked URLs.

    PERMANENT CONTRACT (decided r11, VERDICT r10 #6; first analyzed
    ADVICE r9): a blocked URL glued to leading NON-whitespace
    punctuation — ``(http://ads.tracker.example/x`` or ``,http://…`` —
    is COUNTED (URL_PATTERN matches from the scheme mid-token) but NOT
    scrubbed (the leading boundary here consumes start-of-text or
    whitespace only). The asymmetry is deliberately conservative: the
    counting side over-reports by at most the glued corner, and the
    scrub never deletes text the counts call clean. Widening the
    boundary to a consumed punctuation class was measured and REJECTED
    (not re-litigable without a new counterexample) because it
    breaks the contract in the opposite direction: URL_PATTERN's
    greedy ``[^\\s]+`` tail merges whitespace-free chains, so in
    ``http://good.site/x,http://ads.tracker.example/y`` the counting
    side sees ONE url with host ``good.site`` (n_blocked = 0), while a
    ``,``-admitting scrub boundary would match the embedded blocked
    URL and scrub text the counts say is clean — and unlike this
    corner (conservative: counted, left in place), that one silently
    destroys text. Distinguishing "fresh token" from "mid-token"
    needs a lookbehind over the whole preceding non-whitespace run,
    which the Java∩RE2 subset cannot express; both corners are pinned
    by the hand-example pytest."""
    import re as _re

    alts = "|".join(_re.escape(d) for d in domains)
    return (
        rf"(?i)(?:^|\s)(?:https?://(?:www\.)?|www\.)(?:{alts})"
        rf"(?:[/?#][^\s]*)?(?:\s|$)"
    )


def scrub_blocked_urls(text: Column, domains: tuple[str, ...]) -> Column:
    """Blocked-URL scrub with the boundary contract of
    :func:`blocked_url_pattern` applied: replace matches with one space
    (both span boundaries are consumed), collapse whitespace, trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(text, blocked_url_pattern(domains), " "),
            r"\s+",
            " ",
        )
    )


def markup_profile(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, clean_text, n_tags, had_markup) — the strip plus what was
    removed, for cleaning-rate monitoring."""
    c = F.col(text_col)
    n_tags = F.regexp_count(c, F.lit(r"<[^>]*>"))
    return docs.select(
        F.col(id_col),
        strip_markup(c).alias("clean_text"),
        n_tags.cast("long").alias("n_tags"),
        (n_tags > 0).alias("had_markup"),
    )


def canonical_url(u: Column) -> Column:
    """CC-style URL canonicalization — the dedup KEY every web-curation
    pipeline computes before any text-level dedup (Common Crawl's SURT
    normalization is the public reference shape): two raw URLs that
    canonicalize equal are the same fetch target, and whole-page dups
    collapse on this key for free (no shingling, no hashing).

    Rules (each a plain string transform, identical in the Java∩RE2
    regex subset, so the op is oracle-exact with zero float anywhere):
    - lowercase scheme + host (path/query case is preserved — paths ARE
      case-sensitive; the common normalizer only folds the authority);
    - drop a ``userinfo@`` authority prefix (SURT drops it: credentials
      are not part of the fetch-target identity, and keeping them would
      defeat the www/port folds);
    - strip a leading ``www.`` and the scheme's OWN default port only
      (``:80`` for http, ``:443`` for https — ``http://host:443`` is a
      different fetch target and keeps its port in the key);
    - default missing scheme to ``https`` (bare ``www.`` URLs and
      RFC 3986 §4.2 protocol-relative ``//host/path`` forms);
    - drop the ``#fragment`` (never sent to the server);
    - drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``)
      and SORT the survivors — query-param order is not semantic;
    - strip ONE trailing slash from a non-root path.

    Pure column algebra: split → per-part transforms → reassemble; the
    query-param sort is ``sort_array(split(...))`` (bounded by the URL
    length, never corpus-shaped).
    """
    # fragment first (everything after # is client-side)
    base = F.regexp_replace(u, r"#.*$", "")
    scheme_raw = F.regexp_extract(base, r"^(?i)(https?)://", 1)
    scheme = F.when(scheme_raw == "", F.lit("https")).otherwise(F.lower(scheme_raw))
    # strip the scheme; the optional-group form also consumes a bare
    # leading "//" so a protocol-relative URL parses its authority
    # instead of leaking "//host" into the path (ADVICE r11 #2)
    rest = F.regexp_replace(base, r"^(?i)(https?:)?//", "")
    authority = F.regexp_extract(rest, r"^([^/?]+)", 1)
    # userinfo strip is greedy to the LAST @ (RFC 3986: the host starts
    # after the final @ of the authority)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(authority), r"^.*@", ""), r"^www\.", ""
    )
    # scheme-paired default-port strip (ADVICE r11 #1)
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).otherwise(F.regexp_replace(host, r":443$", ""))
    tail = F.regexp_replace(rest, r"^[^/?]+", "")  # /path?query or ?query or ''
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"),
    )
    qnorm = F.array_join(F.sort_array(kept), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
