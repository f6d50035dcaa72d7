"""Streaming MERGE sink: the reference's incremental-load-then-MERGE
cycle (scripts2/load_fact_sales_dw.py:65-77 one file per run, 299-416
MERGE into the warehouse table) as a single Structured Streaming query.

``foreachBatch`` is Spark's blessed escape hatch for sinks that need
batch-only operations (here: a full-outer MERGE rewrite + atomic table
swap) — each micro-batch arrives exactly-once as a batch DataFrame
together with a ``batch_id`` the checkpoint tracks, so a crashed batch
is re-delivered with the same id and the sink stays idempotent as long
as re-applying the same delta is (an SCD-1 merge is: re-merging already-
merged rows classifies NOOP).

At scale the same topology targets a Delta/Iceberg ``MERGE INTO`` in the
batch function; on plain parquet it rewrites via the staging+swap
protocol (io/sinks.write_staging_swap, crash-safe).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dynamic_etl_spark.io.sinks import write_staging_swap
from dynamic_etl_spark.ops.dedup import dedup_keep_last_agg
from dynamic_etl_spark.ops.keys import assign_surrogate_keys
from dynamic_etl_spark.ops.merge import scd1_merge


def run_streaming_merge(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    *,
    natural_key: Sequence[str],
    surrogate_col: str,
    exact_cols: Sequence[str] = (),
    tolerance_cols: Sequence[str] = (),
    op_col: str = "operation",
    batch_order_col: str | None = None,
    timeout_sec: int = 120,
) -> StreamingQuery:
    """Continuously upsert a parquet table from a stream of change rows.

    Each micro-batch runs the SCD-1 full-outer MERGE against the current
    table and swaps the result into place atomically. The op column is
    dropped from the persisted table (it is per-merge provenance, not
    state). A missing ``table_path`` bootstraps from the first batch
    (declared columns + surrogate keys from 1). Drains with
    ``Trigger.AvailableNow`` and blocks, matching the repo's
    batch-cadence convention; remove the trigger for a continuous
    deployment.

    Because the merge result REPLACES the table, the declared columns
    (``surrogate_col`` + ``natural_key`` + ``exact_cols`` +
    ``tolerance_cols``) must cover every existing table column — a
    column the caller forgot to declare would otherwise be silently
    destroyed by the rewrite, so the first batch raises instead.

    ``scd1_merge`` requires the incoming side to be unique per natural
    key (a full-outer join fans out otherwise, emitting duplicate
    surrogate rows that compound on the next merge). A change stream
    routinely delivers several change rows for one key in a micro-batch,
    so each batch is collapsed first: pass ``batch_order_col`` (an
    event-time / version column present in the stream) to keep the
    LATEST change per key via a ``max_by`` aggregate (map-side combine,
    hot-key safe). Without it, a batch containing duplicate natural keys
    raises — there is no deterministic "last" row in an unordered batch.
    """
    import os

    spark = stream_df.sparkSession
    declared = [surrogate_col, *natural_key, *exact_cols, *tolerance_cols]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_order_col is not None:
            batch_df = dedup_keep_last_agg(
                batch_df, keys=natural_key, order=[batch_order_col]
            )
        else:
            dups = (
                batch_df.groupBy(*natural_key)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
            )
            if not dups.isEmpty():
                raise ValueError(
                    "micro-batch contains duplicate natural keys; pass "
                    "batch_order_col to keep the latest change per key"
                )
        if not os.path.exists(table_path):
            initial = assign_surrogate_keys(
                batch_df.select(*[c for c in declared if c != surrogate_col]),
                order_cols=natural_key,
                key_col=surrogate_col,
            )
            write_staging_swap(initial.select(*declared), table_path)
            return
        existing = spark.read.parquet(table_path)
        undeclared = set(existing.columns) - set(declared)
        if undeclared:
            raise ValueError(
                f"table has columns the merge would destroy (declare them "
                f"as exact/tolerance cols): {sorted(undeclared)}"
            )
        merged = scd1_merge(
            existing,
            batch_df,
            natural_key=natural_key,
            surrogate_col=surrogate_col,
            exact_cols=exact_cols,
            tolerance_cols=tolerance_cols,
            op_col=op_col,
        ).drop(op_col)
        # self-referential rewrite is safe: the swap fully writes the
        # staging copy (executing the read of the current table)
        # before any rename touches final_path
        write_staging_swap(merged, table_path)

    query = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_sec):
        raise TimeoutError(
            f"streaming merge did not drain within {timeout_sec}s; the "
            f"query is still running — raise timeout_sec or stop() it"
        )
    return query


def run_streaming_dedup(
    stream_df: DataFrame,
    corpus_root: str,
    store_root: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    timeout_sec: int = 240,
) -> StreamingQuery:
    """Continuously admit a document stream into a deduplicated corpus:
    each micro-batch runs ``ops/lsh.incremental_near_dup_merge`` against
    the versioned corpus + MinHash signature store and commits both
    deltas as new table versions (io/versioned) — the streaming form of
    the daily-ingest pipeline in tests/test_corpus_ingestion.py.

    Crash consistency across TWO tables: the corpus version commits
    first, the store second, and every batch starts by SELF-HEALING the
    store — corpus docs missing from the store (the corpus-committed/
    store-crashed window) get their signatures recomputed and appended.
    Combined with checkpoint redelivery this makes the sink idempotent:
    a replayed batch finds its docs already in the healed store and
    rejects them all, so the corpus never holds a doc twice. The heal
    probe is an id-only anti-join (normally empty) — cheap relative to
    the admission joins.

    Bootstraps an absent corpus from the first batch (admission against
    an empty corpus still deduplicates WITHIN the batch). Drains with
    ``Trigger.AvailableNow`` and blocks, per the repo batch-cadence
    convention.
    """
    from dynamic_etl_spark.io.versioned import (
        latest_version,
        read_versioned,
        write_versioned,
    )
    from dynamic_etl_spark.ops.lsh import incremental_near_dup_merge, minhash_banded_rows

    spark = stream_df.sparkSession

    def _sigs(docs: DataFrame) -> DataFrame:
        return minhash_banded_rows(
            docs, id_col, text_col, num_hashes, bands, shingle_k
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from dynamic_etl_spark.ops.text import tokens

        # zero-token docs can never collide (no shingles -> no signature
        # rows), so admitting them would break BOTH invariants this sink
        # maintains: every corpus doc has store signatures (the heal
        # probe would find them "unhealed" forever) and replayed batches
        # re-reject their docs (an unsignatured doc re-admits, duplicating
        # ids). A text-dedup corpus has no use for empty text: drop them.
        batch_df = batch_df.select(id_col, text_col).filter(
            F.size(tokens(F.col(text_col))) > 0
        )
        if batch_df.isEmpty():
            return
        if latest_version(corpus_root) is None:
            empty = spark.createDataFrame([], batch_df.schema)
            out = incremental_near_dup_merge(
                empty, batch_df, id_col, text_col,
                threshold=threshold, num_hashes=num_hashes,
                bands=bands, shingle_k=shingle_k,
                existing_banded=_sigs(empty),
            )
            write_versioned(out["accepted"], corpus_root)
            write_versioned(out["new_banded"], store_root)
            return

        corpus = read_versioned(spark, corpus_root)
        # a crash between the bootstrap's two commits leaves a corpus
        # with NO store at all — the widest corpus-committed/
        # store-crashed window; start the heal from an empty store
        # instead of failing the stream on read (review r4)
        if latest_version(store_root) is None:
            store = spark.createDataFrame([], _sigs(corpus.limit(0)).schema)
        else:
            store = read_versioned(spark, store_root)
        unhealed = corpus.join(
            store.select(id_col).distinct(), id_col, "left_anti"
        )
        if not unhealed.isEmpty():
            store = store.unionByName(_sigs(unhealed))
            write_versioned(
                store, store_root,
                base_version=latest_version(store_root), expected_base=True,
            )
        out = incremental_near_dup_merge(
            corpus, batch_df, id_col, text_col,
            threshold=threshold, num_hashes=num_hashes,
            bands=bands, shingle_k=shingle_k, existing_banded=store,
        )
        if out["accepted"].isEmpty():
            return
        write_versioned(
            corpus.unionByName(out["accepted"]), corpus_root,
            base_version=latest_version(corpus_root), expected_base=True,
        )
        write_versioned(
            store.unionByName(out["new_banded"]), store_root,
            base_version=latest_version(store_root), expected_base=True,
        )

    query = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_sec):
        raise TimeoutError(
            f"streaming dedup did not drain within {timeout_sec}s; the "
            f"query is still running — raise timeout_sec or stop() it"
        )
    return query


def run_streaming_semantic_dedup(
    stream_df: DataFrame,
    corpus_root: str,
    store_root: str,
    centers_root: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    max_iter: int = 8,
    timeout_sec: int = 240,
) -> StreamingQuery:
    """Continuously admit an EMBEDDED document stream into a
    semantically-deduplicated corpus — the SemDeDup sibling of
    :func:`run_streaming_dedup` (VERDICT r8 #4: lexical dedup had a
    maintained path, semantic was batch-only). Each micro-batch runs
    ``ops/ann.incremental_semantic_merge`` against the versioned corpus
    + embedding store under the FROZEN centroid fit and commits the
    deltas as new table versions (io/versioned).

    State is THREE tables, committed in dependency order so every crash
    window heals forward:
    - ``centers_root`` (cell, center): fitted ONCE on the bootstrap
      batch and never rewritten — the frozen fit is what makes
      admission independent of arrival order. Committed FIRST; a
      centers-committed/corpus-crashed window re-bootstraps under the
      already-committed fit instead of refitting on a different batch.
      A corpus-committed/centers-crashed window (legacy seeding) refits
      deterministically from the committed corpus.
    - ``corpus_root``: the admitted documents. Committed second.
    - ``store_root`` (id, vec, cell): the admission probe target.
      Committed last; every batch starts by SELF-HEALING it — corpus
      docs missing from the store get re-assigned under the frozen fit
      and appended (the corpus-committed/store-crashed window).

    Combined with checkpoint redelivery this makes the sink idempotent:
    a replayed batch finds its docs already in the healed store under
    their own ids at cosine exactly 1.0 (self-pairs are not excluded)
    and rejects them all, so the corpus never holds a doc twice.
    Zero-norm vectors can never match anything (no self-hit on replay)
    and would re-admit forever — dropped at the boundary, the semantic
    analogue of the lexical sink's zero-token drop.

    Drains with ``Trigger.AvailableNow`` and blocks, per the repo
    batch-cadence convention.
    """
    from dynamic_etl_spark.io.versioned import (
        latest_version,
        read_versioned,
        write_versioned,
    )
    from dynamic_etl_spark.ops.ann import (
        as_double_vec,
        centers_from_rows,
        centers_to_rows,
        fit_semantic_centers,
        incremental_semantic_merge,
        semantic_store_rows,
    )

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(id_col, vec_col).filter(
            F.aggregate(
                as_double_vec(F.col(vec_col)),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
            > 0.0
        )
        if batch_df.isEmpty():
            return
        if latest_version(corpus_root) is None:
            # bootstrap: freeze the fit on the first batch — unless a
            # centers-committed/corpus-crashed window already froze one
            if latest_version(centers_root) is None:
                centers = fit_semantic_centers(
                    batch_df, id_col, vec_col, n_cells, seed, max_iter
                )
                write_versioned(centers_to_rows(spark, centers), centers_root)
            else:
                centers = centers_from_rows(read_versioned(spark, centers_root))
            empty = spark.createDataFrame([], batch_df.schema)
            out = incremental_semantic_merge(
                empty, batch_df, id_col, vec_col,
                threshold=threshold, n_cells=n_cells, n_probe=n_probe,
                seed=seed, centers=centers,
                existing_assigned=semantic_store_rows(
                    empty, id_col, vec_col, centers
                ),
            )
            write_versioned(out["accepted"], corpus_root)
            write_versioned(out["new_assigned"], store_root)
            return

        corpus = read_versioned(spark, corpus_root)
        # a corpus seeded outside this sink (or a crash before the
        # bootstrap's centers commit under older ordering) has no fit:
        # refit deterministically from the committed corpus and freeze
        if latest_version(centers_root) is None:
            centers = fit_semantic_centers(
                corpus, id_col, vec_col, n_cells, seed, max_iter
            )
            write_versioned(centers_to_rows(spark, centers), centers_root)
        else:
            centers = centers_from_rows(read_versioned(spark, centers_root))
        if latest_version(store_root) is None:
            store = semantic_store_rows(corpus.limit(0), id_col, vec_col, centers)
        else:
            store = read_versioned(spark, store_root)
        unhealed = corpus.join(
            store.select(id_col).distinct(), id_col, "left_anti"
        )
        if not unhealed.isEmpty():
            store = store.unionByName(
                semantic_store_rows(unhealed, id_col, vec_col, centers)
            )
            write_versioned(
                store, store_root,
                base_version=latest_version(store_root), expected_base=True,
            )
        out = incremental_semantic_merge(
            corpus, batch_df, id_col, vec_col,
            threshold=threshold, n_cells=n_cells, n_probe=n_probe,
            seed=seed, centers=centers, existing_assigned=store,
        )
        if out["accepted"].isEmpty():
            return
        write_versioned(
            corpus.unionByName(out["accepted"]), corpus_root,
            base_version=latest_version(corpus_root), expected_base=True,
        )
        write_versioned(
            store.unionByName(out["new_assigned"]), store_root,
            base_version=latest_version(store_root), expected_base=True,
        )

    query = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_sec):
        raise TimeoutError(
            f"streaming semantic dedup did not drain within {timeout_sec}s; "
            f"the query is still running — raise timeout_sec or stop() it"
        )
    return query


def run_streaming_curation(
    stream_df: DataFrame,
    corpus_root: str,
    fp_root: str,
    lex_root: str,
    sem_root: str,
    centers_root: str,
    ledger_root: str,
    checkpoint_dir: str,
    *,
    id_col: str,
    text_col: str,
    vec_col: str | None = None,
    lex_threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    hash_mode: str = "xxhash",
    sem_threshold: float = 0.95,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    max_iter: int = 8,
    dsir_root: str | None = None,
    dsir_target=None,
    dsir_min_log_weight=None,
    dsir_buckets: int = 128,
    timeout_sec: int = 480,
) -> StreamingQuery:
    """The THREE-TIER curation gate on a stream (VERDICT r9 #4): each
    micro-batch runs exact-fingerprint, banded-MinHash lexical, and
    SemDeDup semantic admission — the composition of
    registry/curation's maintained gate — against persistent versioned
    stores, with per-doc tier attribution appended to a ledger table.

    ``dsir_root`` (VERDICT r11 #4) enables the optional FOURTH tier:
    DSIR quality admission. The bucket-ratio table is FIT ONCE — on the
    committed corpus if one exists, else on the bootstrap batch, with
    ``dsir_target`` (a Column predicate over the doc frame, e.g.
    ``F.col("doc_id") % 4 == 0``) marking the target slice — committed
    to ``dsir_root`` before anything depends on it (the centers_root
    convention), and every later batch scores its semantic survivors
    against the frozen table (ops/quality.dsir_gate), admitting docs
    whose exact-decimal log weight clears ``dsir_min_log_weight``.
    Attribution gains the ``quality`` category. Per-doc weights depend
    only on the doc text and the frozen table, so streamed admission
    equals the batch gate's on any batch split (pytest-pinned). DSIR
    keeps NO per-doc store — the frozen fit is its entire state, so
    there is nothing to heal.

    Composes what :func:`run_streaming_dedup` and
    :func:`run_streaming_semantic_dedup` each do for ONE tier, with
    crash-consistent commits across BOTH state families (previously a
    user wiring the three-tier policy on a stream had to hand-build
    this).

    State is SIX tables. ``centers_root`` (frozen semantic fit) commits
    once, before anything depends on it. Per batch the commit order is:

    1. ``ledger_root`` — (id, admitted, rejected_by, batch_id) rows,
       the batch's attribution, with ``batch_id`` in the commit
       metadata. The transactional pivot: committed FIRST, so every
       later crash window can finish deterministically from it.
    2. ``corpus_root`` — the admitted documents (text + optional
       embedding).
    3. ``fp_root`` / ``lex_root`` / ``sem_root`` — the exact
       fingerprint set, banded signature store, and assigned embedding
       store; each delta is the tier op's output FILTERED TO THE FINAL
       ADMITTED SET (a tier-2 survivor the semantic tier rejects must
       never leave signatures behind — phantom store entries would
       reject future legitimate batches).

    Crash recovery, window by window:
    - before the ledger commit: checkpoint redelivery recomputes the
      whole batch against unchanged state — identical result (store
      heals only materialize rows already implied by the corpus).
    - after the ledger, before/among the state commits: the replayed
      batch finds its ``batch_id`` at-or-below the ledger metadata,
      derives the admitted set FROM THE LEDGER (no recompute — so
      attribution can never flip to 'exact' the way a
      recompute-on-replay would report it), re-appends any admitted
      docs the corpus lost, and heals the stores forward.
    - corpus committed outside the sink / store crashed: every batch
      starts by self-healing all three stores from the corpus (the
      single-tier sinks' heal, composed).

    Boundary drops mirror the single-tier sinks: zero-token docs are
    dropped (no lexical signature is possible; an empty-text doc has no
    place in a text corpus), zero-norm embeddings are normalized to
    NULL (they can never match; the composed gate's convention routes
    embedding-less survivors past the semantic tier). Replay
    idempotence needs no cosine self-hit here: every admitted doc's
    fingerprint is in the fp store, so tier 1 re-rejects replays even
    for docs that have no embedding.

    ``vec_col=None`` runs the two lexical tiers only. Pair ONE
    checkpoint with ONE state-table family for the stream's lifetime
    (the run_streaming_rollup rule): a fresh checkpoint renumbers
    batches from 0, which the ledger treats as replays. Drains with
    ``Trigger.AvailableNow`` and blocks, per the repo batch-cadence
    convention.
    """
    from dynamic_etl_spark.io.versioned import (
        latest_metadata,
        latest_version,
        read_versioned,
        write_versioned,
    )
    from dynamic_etl_spark.ops.ann import (
        as_double_vec,
        centers_from_rows,
        centers_to_rows,
        fit_semantic_centers,
        incremental_semantic_merge,
        semantic_store_rows,
    )
    from dynamic_etl_spark.ops.lsh import (
        incremental_near_dup_merge,
        minhash_banded_rows,
    )
    from dynamic_etl_spark.ops.quality import dsir_bucket_ratios, dsir_gate
    from dynamic_etl_spark.ops.text import fingerprint_md5, tokens

    if dsir_root is not None and (dsir_target is None or dsir_min_log_weight is None):
        raise ValueError(
            "dsir_root requires dsir_target (the fit's target-slice "
            "predicate) and dsir_min_log_weight (the admission threshold)"
        )

    spark = stream_df.sparkSession

    def _read_or(root: str, template: DataFrame) -> DataFrame:
        if latest_version(root) is None:
            return template.limit(0)
        return read_versioned(spark, root)

    def _append(root: str, current: DataFrame, delta: DataFrame) -> None:
        if delta.isEmpty():
            return
        base = latest_version(root)
        if base is None:
            write_versioned(current.unionByName(delta), root)
        else:
            write_versioned(
                current.unionByName(delta), root,
                base_version=base, expected_base=True,
            )

    def _fp_rows(docs: DataFrame) -> DataFrame:
        return docs.select(
            F.col(id_col), fingerprint_md5(F.col(text_col)).alias("__fp")
        )

    def _sigs(docs: DataFrame) -> DataFrame:
        return minhash_banded_rows(
            docs, id_col, text_col, num_hashes, bands, shingle_k,
            hash_mode=hash_mode,
        )

    def _heal(corpus: DataFrame, centers):
        """Self-heal every store against the committed corpus; returns
        the post-heal (fp_store, lex_store, sem_store) frames."""
        fp_store = _read_or(fp_root, _fp_rows(corpus))
        lex_store = _read_or(lex_root, _sigs(corpus.limit(0)))
        unhealed_fp = corpus.join(
            fp_store.select(id_col).distinct(), id_col, "left_anti"
        )
        if not unhealed_fp.isEmpty():
            delta = _fp_rows(unhealed_fp)
            _append(fp_root, fp_store, delta)
            fp_store = fp_store.unionByName(delta)
        unhealed_lex = corpus.join(
            lex_store.select(id_col).distinct(), id_col, "left_anti"
        )
        if not unhealed_lex.isEmpty():
            delta = _sigs(unhealed_lex)
            _append(lex_root, lex_store, delta)
            lex_store = lex_store.unionByName(delta)
        sem_store = None
        if vec_col is not None and centers is not None:
            emb_corpus = corpus.filter(F.col(vec_col).isNotNull()).select(
                id_col, vec_col
            )
            sem_store = _read_or(
                sem_root,
                semantic_store_rows(emb_corpus.limit(0), id_col, vec_col, centers),
            )
            unhealed_sem = emb_corpus.join(
                sem_store.select(id_col).distinct(), id_col, "left_anti"
            )
            if not unhealed_sem.isEmpty():
                healed = semantic_store_rows(unhealed_sem, id_col, vec_col, centers)
                _append(sem_root, sem_store, healed)
                sem_store = sem_store.unionByName(healed)
        return fp_store, lex_store, sem_store

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cols = [id_col, text_col] + ([vec_col] if vec_col else [])
        batch_df = batch_df.select(*cols).filter(
            F.size(tokens(F.col(text_col))) > 0
        )
        if vec_col is not None:
            norm_ok = (
                F.aggregate(
                    as_double_vec(F.col(vec_col)),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
                > 0.0
            )
            batch_df = batch_df.withColumn(
                vec_col, F.when(norm_ok, F.col(vec_col))
            )
        if batch_df.isEmpty():
            return
        # several tiers scan the batch; read the stream source once
        batch_df = batch_df.localCheckpoint()

        corpus = _read_or(corpus_root, batch_df)

        # frozen fit: read it, or freeze one on the first embedded docs
        # seen (corpus first — a replayed bootstrap must refit on the
        # same rows; batch otherwise) and commit it BEFORE any state
        # that depends on it
        centers = None
        if vec_col is not None:
            if latest_version(centers_root) is not None:
                centers = centers_from_rows(read_versioned(spark, centers_root))
            else:
                fit_src = corpus.filter(F.col(vec_col).isNotNull())
                if fit_src.isEmpty():
                    fit_src = batch_df.filter(F.col(vec_col).isNotNull())
                if not fit_src.isEmpty():
                    centers = fit_semantic_centers(
                        fit_src, id_col, vec_col, n_cells, seed, max_iter
                    )
                    write_versioned(centers_to_rows(spark, centers), centers_root)

        recorded = -1
        if latest_version(ledger_root) is not None:
            recorded = latest_metadata(ledger_root).get("batch_id", -1)

        if batch_id <= recorded:
            # the ledger already decided this batch (crash after commit
            # window 1): finish the state from its attribution, never
            # recompute — then heal
            ledger = read_versioned(spark, ledger_root)
            admitted_ids = (
                ledger.filter(
                    (F.col("batch_id") == batch_id) & F.col("admitted")
                )
                .select(id_col)
            )
            lost = batch_df.join(admitted_ids, id_col, "leftsemi").join(
                corpus.select(id_col), id_col, "left_anti"
            )
            if not lost.isEmpty():
                _append(corpus_root, corpus, lost)
                corpus = corpus.unionByName(lost)
            _heal(corpus, centers)
            return

        # frozen DSIR ratio table: read it, or fit once (corpus first —
        # a replayed bootstrap must refit on the same rows; batch
        # otherwise) and commit it BEFORE the ledger decision depends on
        # it. Sits AFTER the replay early-return: a replayed batch never
        # reads the table (the ledger decided it), and its original
        # application committed the fit before that ledger commit.
        ratios = None
        if dsir_root is not None:
            if latest_version(dsir_root) is not None:
                ratios = read_versioned(spark, dsir_root).localCheckpoint()
            else:
                fit_src = corpus if not corpus.isEmpty() else batch_df
                ratios = dsir_bucket_ratios(
                    fit_src.select(id_col, text_col),
                    id_col=id_col, text_col=text_col,
                    target=dsir_target, n_buckets=dsir_buckets,
                )
                write_versioned(ratios, dsir_root)

        fp_store, lex_store, sem_store = _heal(corpus, centers)

        # tier 1 — exact fingerprints vs the store, keep-min in batch
        bfp = _fp_rows(batch_df)
        keep1 = (
            bfp.join(fp_store.select("__fp").distinct(), "__fp", "left_anti")
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        s1 = batch_df.join(keep1, id_col, "leftsemi").localCheckpoint()

        # tier 2 — banded MinHash lexical admission vs the store
        out2 = incremental_near_dup_merge(
            corpus, s1, id_col, text_col,
            threshold=lex_threshold, num_hashes=num_hashes, bands=bands,
            shingle_k=shingle_k, existing_banded=lex_store,
            hash_mode=hash_mode,
        )
        s2 = out2["accepted"].localCheckpoint()

        # tier 3 — semantic admission vs the store; embedding-less
        # survivors pass through (the composed gate's convention)
        out3 = None
        if vec_col is not None and centers is not None:
            s2e = s2.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
            emb_corpus = corpus.filter(F.col(vec_col).isNotNull()).select(
                id_col, vec_col
            )
            out3 = incremental_semantic_merge(
                emb_corpus, s2e, id_col, vec_col,
                threshold=sem_threshold, n_cells=n_cells, n_probe=n_probe,
                seed=seed, centers=centers, existing_assigned=sem_store,
            )
            no_emb = s2.filter(F.col(vec_col).isNull()).select(id_col)
            admitted_ids = (
                out3["accepted"].select(id_col).unionByName(no_emb)
            )
        else:
            admitted_ids = s2.select(id_col)

        # tier 4 — DSIR quality admission of the dedup survivors
        # against the frozen ratio table (no per-doc store)
        s3_ids = None
        if ratios is not None:
            s3_ids = admitted_ids.localCheckpoint()
            gate = dsir_gate(
                batch_df.join(s3_ids, id_col, "leftsemi").select(id_col, text_col),
                ratios, id_col=id_col, text_col=text_col,
                min_log_weight=dsir_min_log_weight,
            )
            admitted_ids = gate.filter(F.col("passes")).select(id_col)
        admitted_ids = admitted_ids.localCheckpoint()

        flag = lambda df, name: df.select(id_col, F.lit(True).alias(name))
        attributed = (
            batch_df.select(id_col)
            .join(flag(s1, "__t1"), id_col, "left")
            .join(flag(s2, "__t2"), id_col, "left")
        )
        quality_case = F.lit(None).cast("boolean")
        if s3_ids is not None:
            attributed = attributed.join(flag(s3_ids, "__t3"), id_col, "left")
            quality_case = F.col("__t3")
        ledger_delta = (
            attributed
            .join(flag(admitted_ids, "__adm"), id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("__adm"), F.lit(False)).alias("admitted"),
                F.when(F.coalesce(F.col("__adm"), F.lit(False)), F.lit("none"))
                .when(F.coalesce(quality_case, F.lit(False)), F.lit("quality"))
                .when(F.coalesce(F.col("__t2"), F.lit(False)), F.lit("semantic"))
                .when(F.coalesce(F.col("__t1"), F.lit(False)), F.lit("lexical"))
                .otherwise(F.lit("exact"))
                .alias("rejected_by"),
                F.lit(batch_id).cast("long").alias("batch_id"),
            )
        )
        # commit window 1: the attribution ledger (the pivot)
        ledger_current = _read_or(ledger_root, ledger_delta)
        base = latest_version(ledger_root)
        if base is None:
            write_versioned(
                ledger_delta, ledger_root, metadata={"batch_id": batch_id}
            )
        else:
            write_versioned(
                ledger_current.unionByName(ledger_delta), ledger_root,
                base_version=base, expected_base=True,
                metadata={"batch_id": batch_id},
            )
        # commit window 2: the corpus
        admitted_docs = batch_df.join(admitted_ids, id_col, "leftsemi")
        _append(corpus_root, corpus, admitted_docs)
        # commit window 3: the stores — every delta filtered to the
        # FINAL admitted set
        _append(fp_root, fp_store, bfp.join(admitted_ids, id_col, "leftsemi"))
        _append(
            lex_root, lex_store,
            out2["new_banded"].join(admitted_ids, id_col, "leftsemi"),
        )
        if out3 is not None and sem_store is not None:
            # filtered to the FINAL admitted set like the fp/lex deltas
            # (ADVICE r12 #1): with the DSIR fourth tier active, tier 4
            # can reject a doc tier 3 accepted — an unfiltered semantic
            # delta would permanently store the quality-reject's
            # embedding (_heal only adds rows) and later batches would
            # reject near docs as 'semantic' against a doc absent from
            # the corpus, breaking batch-vs-stream admission parity
            _append(
                sem_root, sem_store,
                out3["new_assigned"].join(admitted_ids, id_col, "leftsemi"),
            )

    query = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_sec):
        raise TimeoutError(
            f"streaming curation did not drain within {timeout_sec}s; the "
            f"query is still running — raise timeout_sec or stop() it"
        )
    return query


def run_streaming_rollup(
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    *,
    keys: Sequence[str],
    value: str,
    timeout_sec: int = 120,
) -> StreamingQuery:
    """Continuously MAINTAIN a per-key aggregate from a stream: each
    micro-batch aggregates alone (ops/agg.build_agg_state — delta-sized
    shuffle) and folds into the versioned state table
    (merge_agg_state), so the rollup is always current without ever
    rescanning history — the streaming form of
    incremental_rollup_maintenance.

    A state FOLD is not idempotent (re-applying a delta double-counts),
    so exactly-once does not come free from foreachBatch redelivery the
    way the dedup sink's store-rejection gave it. This sink uses the
    transactional-sink pattern (Delta txn appId/version): every commit
    records the folded ``batch_id`` in the version metadata, and a
    replayed batch at-or-below the recorded id is SKIPPED — the
    batch-id check and the state commit are one atomic record, so a
    crash between fold and commit replays cleanly (the fold's version
    was never committed) and a crash after commit skips cleanly.

    Read the current rollup any time with
    ``finalize_agg_state(read_versioned(spark, state_root))``.

    Pair ONE checkpoint with ONE state table for the stream's lifetime
    (the appId half of the Delta txn pattern): a fresh checkpoint
    renumbers batches from 0, so its deliveries are treated as replays
    and skipped until ids pass the recorded high-water. Rebuilding
    state means a fresh state_root AND a fresh checkpoint together.
    """
    from dynamic_etl_spark.ops.agg import build_agg_state, merge_agg_state

    return run_streaming_summary(
        stream_df,
        state_root,
        checkpoint_dir,
        build=lambda batch: build_agg_state(batch, list(keys), value),
        merge=merge_agg_state,
        timeout_sec=timeout_sec,
    )


def run_streaming_summary(
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    *,
    build,
    merge,
    timeout_sec: int = 120,
) -> StreamingQuery:
    """Generalized :func:`run_streaming_rollup`: continuously maintain
    ANY mergeable summary from a stream. ``build(batch_df) -> state_df``
    summarizes one micro-batch alone; ``merge(state_df, delta_df) ->
    state_df`` folds it into the stored state. Plugs the whole summary
    suite into the same exactly-once versioned-commit protocol —

        build=lambda b: build_quantile_hist_state(b, keys, v, lo, hi, nb)
        build=lambda b: build_heavy_hitter_state(b, keys, item, k)
        build=lambda b: build_reservoir_state(b, keys, item, n)
        build=lambda b: build_distinct_sketch_state(b, keys, v)
        build=lambda b: build_cm_state(b, [], item, width=w)

    — so maintained percentiles, heavy hitters, reservoirs, and distinct
    sketches all get streaming currency without history rescans.

    Exactly-once semantics are identical to run_streaming_rollup (the
    Delta txn batch-id pattern; see its docstring for the crash cases
    and the one-checkpoint-one-state-table rule).
    """
    from dynamic_etl_spark.io.versioned import (
        latest_metadata,
        latest_version,
        read_versioned,
        write_versioned,
    )

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        current = latest_version(state_root)
        if current is not None:
            applied = latest_metadata(state_root).get("batch_id", -1)
            if batch_id <= applied:
                return  # checkpoint redelivery of an already-folded batch
        delta = build(batch_df)
        if current is None:
            write_versioned(delta, state_root, metadata={"batch_id": batch_id})
            return
        merged = merge(read_versioned(spark, state_root), delta)
        write_versioned(
            merged, state_root,
            base_version=current, expected_base=True,
            metadata={"batch_id": batch_id},
        )

    query = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_sec):
        raise TimeoutError(
            f"streaming summary did not drain within {timeout_sec}s; the "
            f"query is still running — raise timeout_sec or stop() it"
        )
    return query
