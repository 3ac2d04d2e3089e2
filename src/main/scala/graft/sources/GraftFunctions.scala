package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 FUNCTION CATALOG entries backing the partition TRANSFORMS (r18):
  * Spark resolves a transform inside a write's clustered distribution
  * (`RequiresDistributionAndOrdering`) through the table catalog's
  * FunctionCatalog — without these, a `PARTITIONED BY (bucket(n, k))`
  * or `days(ts)` write could only cluster by the SOURCE column, so one
  * partition tuple would spread across every task and the fan-out
  * writer would emit one file per (task × tuple) instead of one per
  * tuple per job. With them, the shuffle key IS the transform value —
  * the Iceberg layout discipline — and the same functions make the
  * catalog storage-partitioned-join-ready.
  *
  * Every function here agrees EXACTLY with GraftPartitions' writer
  * evaluator and literal rendering (one canonicalization, all sides):
  * bucket = murmur3 over the value's canonical string mod n; time
  * transforms = the epoch ordinals; truncate = prefix / floor.
  */
private[sources] object GraftFunctions {

  val names: Seq[String] =
    Seq("bucket", "days", "months", "hours", "years", "truncate")

  def load(name: String): UnboundFunction = name match {
    case "bucket" => BucketFn
    case "days" => TimeFn("days")
    case "months" => TimeFn("months")
    case "hours" => TimeFn("hours")
    case "years" => TimeFn("years")
    case "truncate" => TruncateFn
    case other => throw new UnsupportedOperationException(
      s"graft catalog has no function '$other' " +
        s"(available: ${names.mkString(", ")})")
  }

  /** The value's canonical string — MUST match
    * GraftPartitions.evaluator's identity rendering per type. */
  private def canonical(dt: DataType, row: InternalRow, idx: Int): String =
    dt match {
      case StringType => row.getUTF8String(idx).toString
      case IntegerType | DateType => row.getInt(idx).toString
      case LongType | TimestampType | TimestampNTZType =>
        row.getLong(idx).toString
      case BooleanType => row.getBoolean(idx).toString
      case d: DecimalType => row.getDecimal(idx, d.precision, d.scale).toString
      case other => throw new UnsupportedOperationException(
        s"graft bucket over ${other.simpleString}")
    }

  private object BucketFn extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): murmur3 hash of the value's canonical string mod n"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (n, col), got ${inputType.simpleString}")
      val dt = inputType.fields(1).dataType
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, dt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket(${dt.sql})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Int = {
          val n = input.getInt(0)
          Math.floorMod(scala.util.hashing.MurmurHash3.bytesHash(
            canonical(dt, input, 1).getBytes("UTF-8"), 42), n)
        }
      }
    }
  }

  private case class TimeFn(kind: String) extends UnboundFunction {
    override def name(): String = kind
    override def description(): String = s"$kind(ts): epoch-$kind ordinal"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$kind takes one DATE/TIMESTAMP column")
      val dt = inputType.fields.head.dataType
      require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
        s"$kind() needs DATE/TIMESTAMP, got ${dt.simpleString}")
      new ScalarFunction[Long] {
        override def inputTypes(): Array[DataType] = Array(dt)
        override def resultType(): DataType = LongType
        override def name(): String = kind
        override def canonicalName(): String = s"graft.$kind(${dt.sql})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Long = {
          val days: Int = dt match {
            case DateType => input.getInt(0)
            case _ => Math.floorDiv(input.getLong(0), 86400000000L).toInt
          }
          kind match {
            case "days" => days.toLong
            case "hours" =>
              if (dt == DateType) days.toLong * 24L
              else Math.floorDiv(input.getLong(0), 3600000000L)
            case "months" =>
              val d = java.time.LocalDate.ofEpochDay(days.toLong)
              (d.getYear - 1970L) * 12L + (d.getMonthValue - 1)
            case "years" =>
              java.time.LocalDate.ofEpochDay(days.toLong).getYear - 1970L
          }
        }
      }
    }
  }

  private object TruncateFn extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): string prefix / integer floor-to-width"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (w, col), got ${inputType.simpleString}")
      val dt = inputType.fields(1).dataType
      dt match {
        case StringType => new ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
          override def inputTypes(): Array[DataType] =
            Array(IntegerType, StringType)
          override def resultType(): DataType = StringType
          override def name(): String = "truncate"
          override def canonicalName(): String = "graft.truncate(string)"
          override def isResultNullable: Boolean = true
          override def produceResult(input: InternalRow)
              : org.apache.spark.unsafe.types.UTF8String =
            org.apache.spark.unsafe.types.UTF8String.fromString(
              input.getUTF8String(1).toString.take(input.getInt(0)))
        }
        case IntegerType | LongType => new ScalarFunction[Long] {
          override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
          override def resultType(): DataType = LongType
          override def name(): String = "truncate"
          override def canonicalName(): String = s"graft.truncate(${dt.sql})"
          override def isResultNullable: Boolean = true
          override def produceResult(input: InternalRow): Long = {
            val w = input.getInt(0).toLong
            val v = if (dt == IntegerType) input.getInt(1).toLong
              else input.getLong(1)
            v - Math.floorMod(v, w)
          }
        }
        case other => throw new UnsupportedOperationException(
          s"truncate over ${other.simpleString}")
      }
    }
  }
}
