package graft.table

import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Iceberg-style HIDDEN partitioning: the table declares a spec of derived
 * partition fields (identity / bucket / truncate transforms over source
 * columns), writers lay data files out one-partition-tuple-per-file, the
 * manifest records each file's tuple, and the scan planner eliminates whole
 * files from a query's predicates on the SOURCE columns — the user never
 * writes or even sees the derived field. This is the missing third pruning
 * tier next to zonemaps ([[Pruning]]) and per-file blooms ([[FileBloom]]):
 * zonemaps earn their keep after a curve cluster rewrite, blooms on point
 * lookups, while partition tuples prune EXACTLY and from birth — an
 * append-heavy table gets codec/bucket elimination before any maintenance
 * pass ever runs, and at 10^5–10^6 files the tuple check is a driver-side
 * string compare per file, no stats parsing.
 *
 * The reference's analog is the key-cluster row→cluster assignment that
 * drives its grouped layouts (cursor/src/main/java/cursors/Clusters.kt:
 * 106-117); here the assignment is declarative and the payoff is file
 * elimination rather than cursor positioning.
 *
 * Layout mechanics: writers add one derived `_p_<field>` column per spec
 * field and write `partitionBy(_p_...)` — Spark's dynamic-partition writer
 * guarantees each output file holds exactly one tuple, encodes the tuple in
 * Hive-style path segments (`_p_codec=ulaw/`), and DROPS the derived column
 * from the file contents (hidden: reading the file back never shows it).
 * [[MetaStore.collectStats]] parses the segments back into
 * [[DataFile.partition]]. Files written without the spec (pre-spec history,
 * ops that don't reconstruct tuples) carry an EMPTY tuple and are always
 * kept — partition pruning, like zonemaps, is a pure IO optimization whose
 * misses only cost speed, never rows.
 *
 * Safety contract per transform (mirrors [[Pred.mayMatch]]'s "false only on
 * proof" rule):
 *  - identity: every row in the file has source == tuple value, so any
 *    [[Pred]] evaluates exactly against a synthetic min==max stat;
 *  - truncate(w), numeric: rows lie in [v, v+w-1] — range preds evaluate
 *    against that synthetic stat; string truncate prunes equality/in-set by
 *    prefix and keeps everything else;
 *  - bucket(n): only equality/in-set prune (compare the probe's bucket,
 *    computed with the SAME xxhash64 the write side used); ranges keep.
 *    The probe value is coerced to the declared `sourceType` first — a
 *    probe that cannot coerce keeps the file rather than risking a wrong
 *    hash of a mistyped literal.
 */
final case class PartField(
    name: String,
    source: String,
    transform: String, // identity | bucket | truncate
    param: Long, // bucket count / truncate width; 0 for identity
    sourceType: String) { // string | int | long (bucket hash + numeric compares)

  require(Set("identity", "bucket", "truncate").contains(transform),
    s"unknown partition transform '$transform'")
  require(transform == "identity" || param > 0,
    s"$transform($name) needs param > 0")

  def numericSource: Boolean = sourceType == "int" || sourceType == "long"

  /** The derived write-side column (hidden from readers by partitionBy). */
  def expr: Column = transform match {
    case "identity" => col(source)
    case "bucket" => pmod(xxhash64(col(source)), lit(param))
    case "truncate" =>
      if (numericSource)
        (col(source).cast("long") - pmod(col(source).cast("long"), lit(param)))
      else substring(col(source), 1, param.toInt)
  }

  /** Driver-side bucket of a probe value — MUST agree with [[expr]]'s
   * xxhash64 (same input type, Spark's default seed). None = the probe
   * cannot be coerced to the declared source type (caller keeps the file). */
  def bucketOf(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val lit: Option[Literal] =
      try sourceType match {
        case "string" => Some(Literal.create(v.toString))
        case "int" => Some(Literal.create(v.toString.trim.toInt))
        case "long" => Some(Literal.create(v.toString.trim.toLong))
        case _ => None
      } catch { case _: NumberFormatException => None }
    lit.map { l =>
      // seed 42 = functions.xxhash64's default (the write side's expr)
      val h = XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
      ((h % param) + param) % param
    }
  }

  /** Can a file whose tuple value for this field is `v` contain a row
   * matching `pred` (a predicate on this field's SOURCE column)? */
  def mayMatch(v: String, pred: Pred): Boolean = transform match {
    case "identity" => pred.mayMatch(syntheticStats(v, v))
    case "truncate" if numericSource =>
      try {
        val lo = BigDecimal(v)
        pred.mayMatch(syntheticStats(lo.toString, (lo + param - 1).toString))
      } catch { case _: NumberFormatException => true }
    case "truncate" =>
      pred match {
        case Pred.EqualTo(_, pv) => pv.toString.take(param.toInt) == v
        case Pred.InSet(_, vs) => vs.exists(_.toString.take(param.toInt) == v)
        case _ => true // prefix-range pruning possible but kept conservative
      }
    case "bucket" =>
      pred match {
        case Pred.EqualTo(_, pv) =>
          bucketOf(pv).forall(b => v.toLongOption.forall(_ == b))
        case Pred.InSet(_, vs) =>
          vs.exists(x => bucketOf(x).forall(b => v.toLongOption.forall(_ == b)))
        case _ => true
      }
  }

  /** Dual proof: is EVERY row of a file with tuple value `v` guaranteed to
   * match `pred`? (identity: pred holds at the point v; numeric truncate:
   * pred holds over the whole window; bucket/string-truncate: never
   * provable). Drives the metadata-only partition-drop delete path. */
  def mustMatch(v: String, pred: Pred): Boolean = transform match {
    case "identity" => pred.mustMatchAll(syntheticStats(v, v))
    case "truncate" if numericSource =>
      try {
        val lo = BigDecimal(v)
        pred.mustMatchAll(syntheticStats(lo.toString, (lo + param - 1).toString))
      } catch { case _: NumberFormatException => false }
    case _ => false
  }

  /** One-row synthetic file whose stats are exactly this field's value
   * range — reuses [[Pred.mayMatch]]'s conservative compare machinery. */
  private def syntheticStats(min: String, max: String): DataFile =
    DataFile("", rows = 1L, sizeBytes = 0L,
      stats = Map(source -> ColStat(min, max, numericSource, 0L)))
}

final case class PartitionSpec(fields: Seq[PartField]) {
  require(fields.map(_.name).distinct.size == fields.size,
    "duplicate partition field names")

  /** Write `df` under `dir` with one tuple per output file; the derived
   * `_p_` columns live only in the directory names. Callers control file
   * sizing with `df`'s own partitioning (each task fans out one file per
   * tuple it holds — Iceberg's fanout-writer behavior). */
  def write(df: DataFrame, dir: String): Unit = {
    val pcols = fields.map(f => f.expr.as(Partitioning.ColPrefix + f.name))
    df.select(df.columns.map(col) ++ pcols: _*)
      .write.mode("overwrite")
      .partitionBy(fields.map(Partitioning.ColPrefix + _.name): _*)
      .parquet(dir)
  }

  /** File elimination: false ONLY when some field's tuple value PROVES no
   * row can match `pred`. Files without a tuple (pre-spec, or written by an
   * op that doesn't reconstruct tuples) are kept. */
  def mayMatch(file: DataFile, pred: Pred): Boolean =
    fields.filter(_.source == pred.column).forall { f =>
      file.partition.get(f.name) match {
        case None => true
        case Some(Partitioning.HiveNull) => true // all-null source: keep
        case Some(v) => f.mayMatch(v, pred)
      }
    }

  /** Dual of [[mayMatch]]: true ONLY when some field's tuple value PROVES
   * every row of the file matches `pred`. */
  def mustMatchAll(file: DataFile, pred: Pred): Boolean =
    fields.exists(f => f.source == pred.column &&
      file.partition.get(f.name).exists(v =>
        v != Partitioning.HiveNull && f.mustMatch(v, pred)))

  /** Memoizing batch filter for one query's `preds`: distinct tuple values
   * number in the transform ranges' product, not the file count, so at
   * 10^5–10^6 files each (field, value, pred) decision is computed once and
   * the per-file cost is a hash probe (measured ~20x over per-file
   * [[mayMatch]] at 200k files in `graft.bench.MetaScale`). */
  def pruner(preds: Seq[Pred]): DataFile => Boolean = {
    val checks: Seq[(Int, Pred, PartField)] = for {
      (p, pi) <- preds.zipWithIndex
      f <- fields if f.source == p.column
    } yield (pi, p, f)
    if (checks.isEmpty) (_: DataFile) => true
    else {
      // one memo per (pred, field) check, keyed by the raw tuple value —
      // no compound-key allocation on the per-file hot path
      val compiled = checks.map { case (_, p, fld) =>
        val memo = new java.util.HashMap[String, java.lang.Boolean]()
        (fld.name, (v: String) => {
          val cached = memo.get(v)
          if (cached != null) cached.booleanValue()
          else {
            val r = fld.mayMatch(v, p)
            memo.put(v, Boolean.box(r))
            r
          }
        })
      }
      file =>
        compiled.forall { case (fieldName, check) =>
          file.partition.get(fieldName) match {
            case None => true
            case Some(Partitioning.HiveNull) => true
            case Some(v) => check(v)
          }
        }
    }
  }
}

object Partitioning {
  val ColPrefix = "_p_"
  val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  def identity(source: String, sourceType: String = "string"): PartField =
    PartField(source, source, "identity", 0L, sourceType)
  def bucket(source: String, n: Int, sourceType: String = "string"): PartField =
    PartField(s"${source}_bucket", source, "bucket", n.toLong, sourceType)
  def truncate(source: String, w: Long, sourceType: String = "long"): PartField =
    PartField(s"${source}_trunc", source, "truncate", w, sourceType)

  /** Parse `_p_<name>=<value>` Hive segments out of a data-file path.
   * Decodes with SPARK's partition-path convention (the segments are
   * written by `partitionBy`), not URLDecoder — URL decoding turns a
   * literal '+' (which Spark does NOT escape) into a space, so a value
   * like "a+b" would record the wrong tuple: pruned scans would skip its
   * file and a partition-drop delete on "a b" could remove it. */
  def tupleOf(path: String): Map[String, String] =
    path.split('/').iterator.collect {
      case seg if seg.startsWith(ColPrefix) && seg.contains('=') =>
        val i = seg.indexOf('=')
        seg.substring(ColPrefix.length, i) ->
          ExternalCatalogUtils.unescapePathName(seg.substring(i + 1))
    }.toMap

  /** Re-encode a tuple as path segments (compaction bins re-home their
   * outputs under the tuple's directory so stats re-parse it) — same
   * Spark convention as the write side, so re-homed and freshly-written
   * segments are byte-identical for equal values. */
  def pathOf(tuple: Map[String, String]): String =
    tuple.toSeq.sortBy(_._1).map { case (k, v) =>
      s"$ColPrefix$k=${ExternalCatalogUtils.escapePathName(v)}"
    }.mkString("/")
}
