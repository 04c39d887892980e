package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.hadoop.fs.{FileSystem, Path}

import java.net.URI
import java.nio.charset.StandardCharsets

/** The lakehouse table-format seam: every mutation graft performs on a
  * managed table goes through this four-method contract, so swapping
  * the sandbox's parquet implementation for Delta Lake or Apache
  * Iceberg touches ONE class and zero operators.
  *
  * Method-by-method mapping to the two mainstream formats:
  *
  *  - '''append(df, txn)''' — Delta: `df.write.format("delta")
  *    .mode("append")` (idempotent via `txnAppId`/`txnVersion`);
  *    Iceberg: `table.newAppend()`.
  *  - '''overwrite(df, txn)''' — Delta: `.mode("overwrite")`; Iceberg:
  *    `newReplacePartitions()` / `REPLACE TABLE ... AS SELECT`.
  *  - '''mergeByKey(changes, …)''' — Delta/Iceberg
  *    `MERGE INTO t USING c ON t.key = c.key
  *     WHEN MATCHED AND c.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED AND c.op <> 'D' THEN INSERT *`.
  *    The changes side is first collapsed to its LAST row per key
  *    (max_by on the caller's ordering — the Debezium-apply collapse),
  *    because SQL MERGE requires a unique source row per key.
  *  - '''snapshot(v) / current''' — time travel: Delta
  *    `option("versionAsOf", v)`; Iceberg `option("snapshot-id", v)`.
  *  - '''schema enforcement''' — both formats reject writes whose
  *    schema drifts from the table's unless evolution is explicitly
  *    enabled; [[ParquetVersionedTable]] enforces the same
  *    (name, dataType) equality on every append/merge and throws
  *    `IllegalArgumentException` on drift.
  *  - '''idempotent transactions''' — the optional `txn` version is
  *    Delta's `txnAppId`/`txnVersion` pair (and Structured Streaming's
  *    `foreachBatch` batchId): committing any version AT OR BELOW the
  *    one already recorded in the table pointer is a no-op (Delta's
  *    `txnVersion <= last recorded ⇒ replay, skip` contract), which is
  *    what makes the streaming upsert sink exactly-once under Spark's
  *    same-batchId retry — and keeps a STALE retry (txn v arriving
  *    after v+1 committed) from rolling the pointer backwards.
  *
  * Every method that mutates returns the committed version number.
  */
trait TableSink {
  /** Latest committed version, if the table exists. */
  def currentVersion: Option[Long]
  /** Snapshot-read the latest version. */
  def current: Option[DataFrame]
  /** Time travel: snapshot-read an explicit committed version. */
  def snapshot(version: Long): DataFrame
  /** All committed versions, ascending (time-travel catalog). */
  def versions: Seq[Long]
  /** Append rows (schema-enforced). With `evolve` — Delta's
    * `mergeSchema` / Iceberg's union-by-name schema evolution — the
    * write may ADD new columns: the table schema becomes the union by
    * name, existing rows read back null for the added columns, and
    * shared columns must still match (name, dataType) exactly.
    * Evolution is a metadata-level operation in the real formats
    * (no data rewritten — what makes column adds free at 100 TB);
    * here each version is a full snapshot, so the union materializes,
    * but the CONTRACT (explicit opt-in, type-checked, null-backfill)
    * is the one production code compiles against. */
  def append(df: DataFrame, txn: Option[Long] = None,
      evolve: Boolean = false): Long
  /** Replace the table contents. */
  def overwrite(df: DataFrame, txn: Option[Long] = None): Long
  /** MERGE: collapse `changes` to its last row per key by `ordCols`,
    * delete keys whose last op is 'D' (when `opCol` is set), upsert the
    * rest; base rows with no change pass through (schema-enforced). */
  def mergeByKey(changes: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: Option[String] = None,
      txn: Option[Long] = None): Long
}

/** Shared MERGE planning used by BOTH the [[TableSink]] implementation
  * and the `etl_merge_cdc` registry query — one merge algebra, two
  * surfaces (a committed table mutation and an auditable action
  * report). Both are single-pass plans: one map-side-combined max_by
  * collapse of the changelog, one full-outer join on the key. */
object TableMerge {

  /** Collapse a changelog to its LAST row per key: max_by on the
    * caller's ordering columns (one keyed aggregation, map-side
    * combined — never a window over the full log). The survivors keep
    * every non-key column, ordering columns included. */
  def lastChangePerKey(changes: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    val others = changes.columns.filterNot(keyCols.contains)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct(ordCols.map(col): _*)).as("_last"))
      .select(keyCols.map(col) ++ others.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** The MERGE join: base FULL OUTER JOIN collapsed-changes on the key,
    * rows whose change op is 'D' dropped, with a `merge_action` column
    * (kept / inserted / updated) describing what MERGE did to each
    * surviving row. Callers project their payload from the joined
    * columns (change columns win for matched rows — UPDATE SET *). */
  def outerMergeWithActions(base: DataFrame, lastChanges: DataFrame,
      keyPairs: Seq[(String, String)],
      opCol: Option[String]): DataFrame = {
    val cond = keyPairs.map { case (b, c) => base(b) === lastChanges(c) }
      .reduce(_ && _)
    val joined = base.join(lastChanges, cond, "full_outer")
    val survivors = opCol.fold(joined)(op => joined.filter(!(col(op) <=> lit("D"))))
    survivors.withColumn("merge_action",
      when(lastChanges(keyPairs.head._2).isNull, lit("kept"))
        .when(base(keyPairs.head._1).isNull, lit("inserted"))
        .otherwise(lit("updated")))
  }
}

/** Parquet implementation of [[TableSink]]: each commit writes a fresh
  * `v=<version>` directory, then atomically flips the `_latest`
  * pointer file (temp file + same-directory ATOMIC_MOVE) — readers see
  * either the old or the new complete version, never a torn one, and
  * no version is ever rewritten in place except by an idempotent retry
  * of its own transaction. This is the read-version / write-version /
  * flip-pointer protocol every lakehouse table format implements; the
  * pointer file plays the Delta `_delta_log` tail / Iceberg metadata
  * pointer role at the fidelity a filesystem sandbox allows.
  *
  * Scale shape: the pointer is one file; versions are immutable parquet
  * directories so concurrent snapshot reads never block a writer;
  * `mergeByKey` costs |table| + |changes| per commit (one collapse agg
  * + one full-outer join, both shuffling on the key — co-located if
  * the table is bucketed by it). Old versions are retained for time
  * travel; production would vacuum by retention policy.
  */
final class ParquetVersionedTable(spark: SparkSession, dir: String)
    extends TableSink {

  // All pointer/catalog IO rides the Hadoop FileSystem API (the
  // AvroConnector discipline): temp-file + same-directory rename works
  // identically on posix, HDFS and rename-capable object stores, so
  // the parquet implementation is object-store-honest, not
  // java.io-local. rename() onto an existing path is not atomic-replace
  // everywhere, so the flip deletes the old pointer first — a reader
  // racing the flip re-reads the versions catalog (see currentVersion).
  private def fs: FileSystem =
    FileSystem.get(URI.create(dir), spark.sparkContext.hadoopConfiguration)

  private val pointerPath = new Path(dir, "_latest")

  def currentVersion: Option[Long] = {
    val f = fs
    if (f.exists(pointerPath)) {
      val in = f.open(pointerPath)
      try {
        val bytes = new Array[Byte](64)
        val n = in.read(bytes)
        Some(new String(bytes, 0, math.max(n, 0), StandardCharsets.UTF_8)
          .trim.toLong)
      } finally in.close()
    } else None
  }

  def current: Option[DataFrame] = currentVersion.map(snapshot)

  def snapshot(version: Long): DataFrame =
    spark.read.parquet(s"$dir/v=$version")

  def versions: Seq[Long] = {
    val f = fs
    val d = new Path(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).iterator
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).toSeq.sorted
  }

  /** Delta/Iceberg reject writes whose schema drifts from the table's
    * unless evolution is explicitly requested; enforce the same. With
    * `evolve`, NEW columns are admitted (union-by-name evolution) but
    * shared columns must still match (name, dataType) — evolution
    * never silently retypes or drops an existing column. */
  private def enforceSchema(df: DataFrame, evolve: Boolean = false): Unit =
    current.foreach { cur =>
      val have = cur.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      if (!evolve)
        require(have == got,
          s"schema drift rejected (enable evolution explicitly): " +
            s"table=$have write=$got")
      else {
        val haveM = have.toMap
        val mismatched = got.filter { case (n, t) =>
          haveM.get(n).exists(_ != t)
        }
        require(mismatched.isEmpty,
          s"schema evolution cannot retype existing columns: $mismatched " +
            s"vs table=$have")
        require(have.map(_._1).forall(got.map(_._1).contains),
          s"schema evolution cannot drop existing columns: " +
            s"table=${have.map(_._1)} write=${got.map(_._1)}")
      }
    }

  /** Commit protocol shared by all mutations: idempotent-retry check on
    * the transaction version, version-directory write, pointer flip.
    * Delta's `txnAppId`/`txnVersion` contract: ANY `txn` at or below the
    * recorded version is a replay and no-ops (returns `txn` untouched) —
    * a stale retry of version v arriving after v+1 committed must never
    * rebuild v and flip the pointer backwards, discarding v+1. Only a
    * txn STRICTLY ABOVE the current version (or an unversioned commit)
    * builds and flips. A pre-flip retry rebuilds the same version
    * deterministically and overwrites it before flipping. */
  private def commit(txn: Option[Long])(build: Long => DataFrame): Long = {
    val cv = currentVersion
    txn.filter(t => cv.exists(t <= _)) match {
      case Some(v) => v // replay of an already-committed transaction
      case None =>
        val v = txn.getOrElse(cv.fold(0L)(_ + 1L))
        build(v).write.mode("overwrite").parquet(s"$dir/v=$v")
        val f = fs
        f.mkdirs(pointerPath.getParent)
        val tmp = new Path(pointerPath.getParent,
          s"_latest_$v.tmp")
        val out = f.create(tmp, true)
        try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        // FileContext.rename(OVERWRITE) is Hadoop's atomic-replace
        // contract (HDFS-atomic; posix rename underneath locally) —
        // readers see the old or the new pointer, never a torn one
        org.apache.hadoop.fs.FileContext
          .getFileContext(URI.create(dir),
            spark.sparkContext.hadoopConfiguration)
          .rename(tmp, pointerPath,
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        v
    }
  }

  def append(df: DataFrame, txn: Option[Long] = None,
      evolve: Boolean = false): Long = {
    enforceSchema(df, evolve)
    val base = current
    // evolution: union by name with null backfill on BOTH sides (the
    // old snapshot lacks added columns; a non-evolving append matches
    // exactly, where allowMissingColumns is a no-op)
    commit(txn)(_ =>
      base.fold(df)(df.unionByName(_, allowMissingColumns = evolve)))
  }

  def overwrite(df: DataFrame, txn: Option[Long] = None): Long =
    commit(txn)(_ => df)

  def mergeByKey(changes: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String], opCol: Option[String] = None,
      txn: Option[Long] = None): Long = {
    // Null merge keys are rejected up front: a null key never joins
    // (=== is null-rejecting, like MERGE's ON), so such a row would be
    // mislabeled 'kept' and surface as an all-null snapshot row. Delta
    // MERGE would INSERT it as an unmatched source row — an unkeyed
    // record in a keyed table, which later merges can never address —
    // so fail fast instead, the same posture as schema drift.
    val nullKeyed = changes.filter(
      keyCols.map(col(_).isNull).reduce(_ || _))
    require(nullKeyed.isEmpty,
      s"mergeByKey rejects change rows with null merge keys " +
        s"(${keyCols.mkString(",")}); filter them upstream")
    val last = TableMerge.lastChangePerKey(changes, keyCols, ordCols)
    // The stored payload is the TABLE's column set — changelog-only
    // bookkeeping columns (op codes, sequence numbers absent from the
    // table schema) never leak into the snapshot. A fresh table adopts
    // every change column except the op code.
    val payload: Seq[String] = current.map(_.columns.toSeq).getOrElse(
      last.columns.filterNot(opCol.contains).toSeq)
    require(payload.forall(last.columns.contains),
      s"changes must carry every table column; missing: " +
        payload.filterNot(last.columns.contains).mkString(","))
    val upserts = opCol.fold(last)(op => last.filter(!(col(op) <=> lit("D"))))
    enforceSchema(upserts.select(payload.map(col): _*))
    commit(txn) { _ =>
      current match {
        case None => upserts.select(payload.map(col): _*)
        case Some(base) =>
          // UPDATE SET * / INSERT * / DELETE in one full-outer pass:
          // change columns win for matched keys, base passes through
          // unmatched, keys whose last op is 'D' drop entirely.
          val merged = TableMerge.outerMergeWithActions(
            base.select(payload.map(c => col(c).as(s"_b_$c")): _*),
            last, keyCols.map(k => (s"_b_$k", k)), opCol)
          merged.select(payload.map(c =>
            when(col(keyCols.head).isNotNull, col(c))
              .otherwise(col(s"_b_$c")).as(c)): _*)
      }
    }
  }
}
