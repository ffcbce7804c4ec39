"""Streaming sinks (SURVEY §2.2 K1-K7).

The reference's delivery contract is at-least-once + idempotent sink
(ES doc-id upsert absorbs replays; offsets committed after write,
MyOffsetsUtils.scala:10-21). Structured Streaming upgrades this to
exactly-once per sink: the checkpoint records the batch id atomically
with offsets, and the foreachBatch writer here is idempotent on batch id
(replayed batches overwrite their own output, never duplicate).

Local sinks are parquet directories; on a cluster the same writers point
at object storage + a table format with real MERGE (Delta/Iceberg). The
upsert key discipline (mid / detail_id — DwdDauApp.scala:211,
DwdOrderApp.scala:260) is preserved by in-batch key dedup + per-batch
idempotent writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def idempotent_partitioned_writer(
    out_dir: str,
    key_cols: list[str],
    partition_col: str | None = "dt",
    order_col: str | None = None,
):
    """K3+K4: idempotent upsert into a date-partitioned table.

    Per batch: dedup on key, then write to a batch-id-suffixed subdir
    committed atomically by rename. Replaying a batch id rewrites the same
    subdir — exactly-once downstream.

    ``order_col`` picks the in-batch winner deterministically: the row with
    the greatest order_col per key survives (the ES bulk last-write-wins of
    MyEsUtils.scala:69-79, where "last" is the newest event). Without it,
    dropDuplicates keeps an arbitrary row — fine only when duplicates are
    exact copies.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
            deduped = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            deduped = batch_df.dropDuplicates(key_cols)
        target = os.path.join(out_dir, f"batch={batch_id}")
        writer = deduped.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target)

    return write


_MANIFEST = "_MANIFEST"


def _read_manifest(out_dir: str) -> dict | None:
    """The committed table state, or None for a never-compacted sink.
    One small JSON file: {"gen": N, "through_batch": M} — generation
    dir ``gen=N`` holds the compacted rows of every batch id <= M."""
    import json

    path = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    """The ONE atomic step of the compaction protocol: write the new
    manifest beside the old one, fsync, then ``os.replace`` onto the
    live name — POSIX rename-within-a-directory is atomic, so a reader
    resolves either the old generation or the new one, never a torn
    mix. (On a cluster this is the table format's commit — Delta's
    _delta_log entry, Iceberg's metadata swap; reference contract:
    per-doc atomic upsert, MyEsUtils.scala:69-79.)"""
    import json

    tmp = os.path.join(out_dir, f"{_MANIFEST}.tmp.{os.getpid()}")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    # immutable per-generation copy AFTER the live commit (additive
    # metadata for time travel; written after so a crash can never
    # leave a version file naming an uncommitted generation — a lost
    # copy for the LIVE generation falls back to the live manifest)
    ver = os.path.join(out_dir, f"{_MANIFEST}.v{manifest['gen']}")
    with open(ver + ".tmp", "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(ver + ".tmp", ver)


def _committed_generations(out_dir: str) -> list[int]:
    """Generation ids with a committed snapshot still cataloged:
    versioned manifests plus the live manifest's generation."""
    gens = set()
    if os.path.isdir(out_dir):
        for d in os.listdir(out_dir):
            if d.startswith(f"{_MANIFEST}.v") and not d.endswith(".tmp"):
                gens.add(int(d[len(_MANIFEST) + 2:]))
    man = _read_manifest(out_dir)
    if man is not None:
        gens.add(man["gen"])
    return sorted(gens)


def _batch_ids(out_dir: str) -> list[int]:
    if not os.path.isdir(out_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("batch=")
    )


def read_sink(spark, out_dir: str, at_gen: int | None = None) -> DataFrame:
    """Read the committed state of a sink directory: the manifest's
    live generation (if the sink has ever been compacted) plus every
    batch dir NEWER than the generation's high-water batch. Uncommitted
    generation dirs, superseded generations and already-compacted batch
    dirs awaiting cleanup are all invisible — the manifest alone
    decides what is part of the table.

    ``at_gen``: TIME TRAVEL — read exactly the snapshot generation N
    committed (no later batches; the table format's VERSION AS OF).
    Available while the generation is inside compact_sink's
    ``retain_generations`` window; a vacuumed generation raises with
    the list of still-readable ones."""
    if at_gen is not None:
        avail = _committed_generations(out_dir)
        gen_dir = os.path.join(out_dir, f"gen={at_gen}")
        if at_gen not in avail or not os.path.isdir(gen_dir):
            raise RuntimeError(
                f"read_sink: generation {at_gen} is not readable (vacuumed "
                f"or never committed); retained generations: "
                f"{[g for g in avail if os.path.isdir(os.path.join(out_dir, f'gen={g}'))]}"
            )
        return spark.read.parquet(gen_dir)
    man = _read_manifest(out_dir)
    if man is None:
        return spark.read.option("basePath", out_dir).parquet(
            os.path.join(out_dir, "batch=*")
        ).drop("batch")
    gen = spark.read.parquet(os.path.join(out_dir, f"gen={man['gen']}"))
    live = [b for b in _batch_ids(out_dir) if b > man["through_batch"]]
    if not live:
        return gen
    batches = (
        spark.read.option("basePath", out_dir)
        .parquet(*[os.path.join(out_dir, f"batch={b}") for b in live])
        .drop("batch")
    )
    # allowMissingColumns: a batch landed after a schema ADDED a column
    # must still read alongside an older generation (and vice versa) —
    # the missing side null-fills, the standard additive-evolution
    # contract of a parquet table
    return gen.unionByName(batches, allowMissingColumns=True)


def _sweep_sink(out_dir: str, live: dict, retain_generations: int) -> None:
    """Reclaim anything the committed manifest already excludes:
    compacted batch dirs, uncommitted generations, and committed
    generations older than the retention window (vacuum). Pure garbage
    collection — crash-safe to skip or repeat. Shared by compaction and
    MERGE (both commit a new generation the same way)."""
    import shutil

    for b in _batch_ids(out_dir):
        if b <= live["through_batch"]:
            shutil.rmtree(
                os.path.join(out_dir, f"batch={b}"), ignore_errors=True
            )
    committed = _committed_generations(out_dir)
    keep = set(committed[-max(retain_generations, 1):])
    keep.add(live["gen"])
    for d in os.listdir(out_dir):
        if d.startswith("gen=") and int(d.split("=", 1)[1]) not in keep:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        elif (
            d.startswith(f"{_MANIFEST}.v")
            and not d.endswith(".tmp")
            and int(d[len(_MANIFEST) + 2:]) not in keep
        ):
            os.remove(os.path.join(out_dir, d))


def merge_into(
    spark,
    out_dir: str,
    source: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    partition_col: str | None = None,
    retain_generations: int = 1,
) -> dict:
    """Declarative MERGE INTO the manifest-committed sink (the Delta /
    Iceberg ``MERGE`` subset a CDC-fed table needs):

      matched target row, source delete flag false -> UPDATED (replaced
        by the source row);
      matched target row, delete flag true          -> DELETED;
      unmatched source row, delete flag false       -> INSERTED;
      unmatched source row, delete flag true        -> no-op (a delete
        of a row that doesn't exist);
      unmatched target row                          -> kept as-is.

    ``delete_col`` names a boolean column on ``source`` (dropped from
    the table schema); None means pure upsert. Source rows must be
    UNIQUE on ``key_cols`` — duplicate keys make "the" matched update
    ambiguous, so the merge fails loudly instead of picking one.

    Protocol (same commit discipline as :func:`compact_sink`): the
    merged table is written to a NEW ``gen=<g+1>`` dir folding in any
    live batch dirs (their high-water batch id moves into the
    manifest), then ONE atomic manifest rename commits — readers see
    the pre-merge table until that instant, the post-merge table after,
    never a torn mix. Crash before the rename leaves an uncommitted dir
    no reader resolves. Time travel (``read_sink(at_gen=...)``) keeps
    the pre-merge snapshot readable within ``retain_generations``.

    Execution shape: ONE full-outer equi-join of target and source on
    the key — the copy-on-write MERGE every table format runs. At
    cluster scale the rewrite narrows to the partitions that contain
    matched keys (file-level manifests); this local layout rewrites the
    table, which is the honest local[32] analog, and the COMMIT
    protocol — the part that matters for correctness — is identical.

    Returns {"gen", "updated", "deleted", "inserted", "kept"}.

    A merge into a NEVER-WRITTEN table bootstraps it: nothing can
    match, so the non-delete-flagged source rows become generation 0
    (Delta's MERGE-creates-table semantics) — this is what lets a CDC
    stream's very first micro-batch use the same writer as every later
    one.
    """
    data_cols_src = [c for c in source.columns if c != delete_col]
    if _read_manifest(out_dir) is None and not _batch_ids(out_dir):
        keep = (
            source.filter(
                ~F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            )
            if delete_col is not None
            else source
        ).select(*data_cols_src)
        # duplicate check on the UNFILTERED source — the existing-table
        # path below checks the full source, and first-batch semantics
        # must agree (a source carrying both a delete row and an upsert
        # row for one key must fail on batch 0, not only on batch 1+)
        dupes = (
            source.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
        )
        if dupes:
            raise ValueError(
                f"merge_into: {dupes} duplicate source key(s) — dedup the "
                f"source first (an ambiguous matched update is a silent "
                f"wrong answer)"
            )
        n_ins = keep.count()
        os.makedirs(out_dir, exist_ok=True)
        writer = keep.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(os.path.join(out_dir, "gen=0"))
        _commit_manifest(out_dir, {"gen": 0, "through_batch": -1})
        return {
            "gen": 0, "updated": 0, "deleted": 0,
            "inserted": n_ins, "kept": 0,
        }
    tgt = read_sink(spark, out_dir)
    data_cols = [c for c in source.columns if c != delete_col]
    if set(data_cols) != set(tgt.columns):
        raise ValueError(
            f"merge_into: source columns {sorted(data_cols)} != target "
            f"columns {sorted(tgt.columns)}"
        )
    dupes = (
        source.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
    )
    if dupes:
        raise ValueError(
            f"merge_into: {dupes} duplicate source key(s) — dedup the "
            f"source first (an ambiguous matched update is a silent "
            f"wrong answer)"
        )
    val_cols = [c for c in data_cols if c not in key_cols]
    s = source.select(
        *key_cols,
        *[F.col(c).alias(f"__src_{c}") for c in val_cols],
        (
            F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            if delete_col is not None
            else F.lit(False)
        ).alias("__del"),
        F.lit(True).alias("__s"),
    )
    t = tgt.withColumn("__t", F.lit(True))
    j = t.join(s, on=key_cols, how="full_outer").persist()
    stats = j.groupBy().agg(
        F.sum(F.when(F.col("__t") & F.col("__s") & ~F.col("__del"), 1)
              .otherwise(0)).alias("updated"),
        F.sum(F.when(F.col("__t") & F.col("__s") & F.col("__del"), 1)
              .otherwise(0)).alias("deleted"),
        F.sum(F.when(F.col("__t").isNull() & ~F.col("__del"), 1)
              .otherwise(0)).alias("inserted"),
        F.sum(F.when(F.col("__s").isNull(), 1).otherwise(0)).alias("kept"),
    ).collect()[0]
    merged = j.filter(
        # survivors: kept targets, updates, inserts — not deletes, not
        # delete-flagged non-matches
        F.col("__s").isNull() | ~F.col("__del")
    ).select(
        *key_cols,
        *[
            F.when(F.col("__s").isNotNull(), F.col(f"__src_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in val_cols
        ],
    )
    man = _read_manifest(out_dir)
    prev_gen = -1 if man is None else man["gen"]
    through = -1 if man is None else man["through_batch"]
    all_batches = _batch_ids(out_dir)
    high = max([b for b in all_batches if b > through], default=through)
    new_gen = prev_gen + 1
    gen_dir = os.path.join(out_dir, f"gen={new_gen}")
    writer = merged.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(gen_dir)
    j.unpersist()
    committed = {"gen": new_gen, "through_batch": high}
    _commit_manifest(out_dir, committed)
    _sweep_sink(out_dir, committed, retain_generations)
    return {
        "gen": new_gen,
        "updated": int(stats.updated),
        "deleted": int(stats.deleted),
        "inserted": int(stats.inserted),
        "kept": int(stats.kept),
    }


def merge_stream_writer(
    out_dir: str,
    key_cols: list[str],
    delete_col: str | None = None,
    order_col: str | None = None,
    partition_col: str | None = None,
    retain_generations: int = 1,
):
    """foreachBatch writer: every CDC micro-batch MERGEs INTO the
    manifest-committed table (the streaming half of :func:`merge_into`
    — upsert + delete semantics from a change stream, with the same
    single-atomic-rename commit per batch).

    ``order_col`` picks the in-batch winner per key deterministically
    (greatest order_col survives) BEFORE the merge, since a CDC batch
    can legally carry several versions of one key but merge_into
    rightly refuses ambiguous sources. Without it, duplicate in-batch
    keys fail loud.

    Exactly-once without an idempotent batch-id trick: CDC rows carry
    ABSOLUTE row states (not increments), so replaying a micro-batch
    after a crash re-merges identical values — updates rewrite the same
    bytes, deletes of deleted keys no-op, inserts of present keys
    become same-value updates. The committed table is a pure function
    of the applied prefix of the stream. The very first micro-batch
    bootstraps the table (merge_into's create-on-merge path).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        src = batch_df
        if order_col is not None:
            # deterministic tiebreak for equal order_col: a payload hash
            # over the remaining columns (asof_join's equal-timestamp
            # discipline) — otherwise a crash-replay of the batch can
            # pick a different winner and break replay idempotency
            others = [
                c for c in batch_df.columns
                if c not in key_cols and c != order_col
            ]
            tiebreak = (
                F.md5(F.to_json(F.struct(*sorted(others))))
                if others
                else F.lit("")  # no payload cols -> ties are identical rows
            )
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(order_col).desc(), tiebreak
            )
            src = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        merge_into(
            batch_df.sparkSession,
            out_dir,
            src,
            key_cols,
            delete_col=delete_col,
            partition_col=partition_col,
            retain_generations=retain_generations,
        )

    return write


def compact_sink(
    spark,
    out_dir: str,
    key_cols: list[str],
    partition_col: str | None = "dt",
    order_col: str | None = None,
    retain_generations: int = 1,
) -> None:
    """Compact a batch-dir sink into one clean partitioned generation
    (the OPTIMIZE/compaction step a MERGE-capable table format runs
    natively), committed by a SINGLE atomic manifest rename.

    Cross-batch winner per key = greatest (order_col, batch) when
    order_col is given, else greatest batch (later batch wins — the ES
    doc-id overwrite semantics, MyEsUtils.scala:69-79). Protocol:

    1. read current state (previous generation + batches above its
       high-water mark, exactly what read_sink serves);
    2. write winners into a NEW ``gen=<g+1>`` dir (crash here leaves an
       uncommitted dir no reader resolves — a later run overwrites it);
    3. atomically replace ``_MANIFEST`` (:func:`_commit_manifest`) —
       THE commit point: before it readers see the old state, after it
       the new, never a torn table;
    4. best-effort cleanup of the superseded generation and compacted
       batch dirs — a crash here leaves garbage the manifest already
       excludes, swept by the next run.

    Batches landing DURING compaction (ids above the captured
    high-water mark) are untouched and stay visible before and after
    the commit.

    ``retain_generations``: how many committed snapshots stay readable
    for time travel (``read_sink(at_gen=...)``) — the VACUUM retention
    knob. Default 1 keeps only the live generation; older snapshots'
    dirs and versioned manifests are reclaimed by the sweep."""

    def _sweep(live: dict) -> None:
        _sweep_sink(out_dir, live, retain_generations)

    man = _read_manifest(out_dir)
    prev_gen = -1 if man is None else man["gen"]
    through = -1 if man is None else man["through_batch"]
    ids = [b for b in _batch_ids(out_dir) if b > through]
    if not ids:
        # empty sink, or already one clean committed generation — still
        # sweep leftovers a crashed earlier cleanup may have stranded
        if man is not None:
            _sweep(man)
        return
    high = max(ids)
    df = (
        spark.read.option("basePath", out_dir)
        .parquet(*[os.path.join(out_dir, f"batch={b}") for b in ids])
    )
    if man is not None:
        # the previous generation's rows lose ties to ANY batch row:
        # they were batch rows once, and re-compaction must not flip a
        # winner that a later batch already overwrote
        prev = spark.read.parquet(
            os.path.join(out_dir, f"gen={prev_gen}")
        ).withColumn("batch", F.lit(-1))
        df = prev.unionByName(df, allowMissingColumns=True)
    order = [F.col("batch").desc()]
    if order_col is not None:
        order.insert(0, F.col(order_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    winners = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "batch")
    )
    new_gen = prev_gen + 1
    gen_dir = os.path.join(out_dir, f"gen={new_gen}")
    writer = winners.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(gen_dir)
    committed = {"gen": new_gen, "through_batch": high}
    _commit_manifest(out_dir, committed)
    # -- committed; everything below is reclaim, crash-safe to skip --
    _sweep(committed)


def split_writer(outputs: dict[str, "DataFrameFn"], out_root: str):
    """K1/P11 local equivalent of the 5-topic split sink: one foreachBatch
    computing all routed outputs from the cached batch and writing each to
    its own directory (OdsBaseLogApp.scala:93-208 wrote 5 Kafka topics).

    ``outputs`` maps name -> function(batch_df) -> DataFrame. The batch is
    persisted once and reused — the reference's pageLogDStream.cache()
    idiom (DwdDauApp.scala:70,81, P14)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for name, fn in outputs.items():
                fn(batch_df).write.mode("overwrite").parquet(
                    os.path.join(out_root, name, f"batch={batch_id}")
                )
        finally:
            batch_df.unpersist()

    return write


def current_dims(spark, out_root: str) -> DataFrame:
    """K5: current-state dim snapshot across all committed batches.

    The reference's Redis ``SET DIM:<TABLE>:<id>`` is a cross-batch
    last-write-wins upsert (OdsBaseDbApp.scala:144-163); the parquet dim
    store keeps every batch's latest rows, so "current row for (table,
    id)" = max by (ts, batch) over all batches. One window over the dim
    store — at scale this is the compaction read a MERGE-capable table
    format does natively."""
    dims = spark.read.option("basePath", os.path.join(out_root, "dims")).parquet(
        os.path.join(out_root, "dims", "batch=*")
    )
    w = Window.partitionBy("table", "id").orderBy(
        F.col("ts").desc(), F.col("batch").desc()
    )
    return (
        dims.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "batch")
    )


def kafka_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """K2+F7: shape a routed DataFrame for the Kafka sink.

    - ``value``: if the frame has no string ``value`` column already, the
      whole row is serialized with ``to_json(struct(*))`` — the reference's
      bean->JSON step before every topic send (OdsBaseLogApp.scala:144,
      163,181,199; MyEsUtils.scala:73).
    - ``key``: optional hash-partitioning key (MyKafkaUtils.scala:98-100);
      cast to string and passed through so Kafka keeps per-key ordering.
      The key column stays IN the serialized value too — the reference
      serializes the full bean including mid into every topic
      (OdsBaseLogApp.scala:144,163,181,199), so downstream consumers
      (e.g. the DAU app parsing PageLog) must not lose it; the Kafka key
      is routing metadata, not a substitute for the field.
    """
    cols = df.columns
    out = df
    if "value" not in cols:
        payload = [c for c in cols if c != "topic"]
        out = out.withColumn("value", F.to_json(F.struct(*payload)))
    selected = ["topic", F.col("value").cast("string").alias("value")]
    if key_col is not None:
        selected.insert(1, F.col(key_col).cast("string").alias("key"))
    return out.select(*selected)


# The reference's five DWD topic names, verbatim (OdsBaseLogApp.scala:93-97).
# Derived names would silently strand a drop-in consumer of the reference
# topics (display/action do NOT follow the <NAME>_LOG_TOPIC pattern).
SPLIT_TOPICS = {
    "page": "DWD_PAGE_LOG_TOPIC",
    "display": "DWD_PAGE_DISPLAY_TOPIC",
    "action": "DWD_PAGE_ACTION_TOPIC",
    "start": "DWD_START_LOG_TOPIC",
    "error": "DWD_ERROR_LOG_TOPIC",
}


def kafka_split_frames(
    outputs: dict[str, DataFrame],
    topics: dict[str, str] | None = None,
    key_col: str | None = "mid",
) -> DataFrame:
    """K1+F7 for the 5-way split: union the routed outputs into ONE
    (topic, key, value) frame for the dynamic-topic Kafka sink — each
    record JSON-serialized (the reference serializes every bean before
    sending, OdsBaseLogApp.scala:144,163,181,199) and keyed by mid so a
    device's events keep per-partition order.

    One sink query instead of five: the topic column does the routing
    (MyKafkaUtils routes by explicit topic name per send; the Kafka sink
    does the same from the column). Topic names come from SPLIT_TOPICS
    (the reference's exact strings) unless overridden."""
    topic_map = SPLIT_TOPICS if topics is None else topics
    frames = []
    for name, df in outputs.items():
        topic = topic_map[name]
        shaped = kafka_frame(
            df.withColumn("topic", F.lit(topic)),
            key_col=key_col if key_col in df.columns else None,
        )
        if "key" not in shaped.columns:
            shaped = shaped.select(
                "topic", F.lit(None).cast("string").alias("key"), "value"
            )
        frames.append(shaped)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def kafka_topic_writer(
    df: DataFrame, brokers: str, checkpoint: str, key_col: str | None = None
):
    """K1/K2 production path: dynamic-topic Kafka sink — rows routed by
    their ``topic`` column, hash-partitioned by ``key`` when given.
    Untestable without a broker/connector jar in this container; the frame
    shape (kafka_frame) is unit-tested."""
    return (
        kafka_frame(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
