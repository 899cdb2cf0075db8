package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.storage.GraftTable

/** The catalog-registered twin of the graft write path's bucket route
  * (`GraftTable.bucketIdColumn`): `bucket(n, key)` = the bucket id file
  * placement used at write time. Registering it on the graft catalog is
  * what lets Catalyst resolve a bucketed table's reported
  * `KeyGroupedPartitioning` into a `TransformExpression` and prove two
  * co-bucketed graft tables compatible — the storage-partitioned-join
  * handshake (the same shape Iceberg's bucket function serves). The
  * `canonicalName` is the compatibility token: both join sides load it
  * from the same catalog class, so equal names + equal bucket counts =
  * co-partitioned.
  *
  * Semantics (MUST stay in lockstep with the write path):
  *  - integral keys: `floorMod(value, n)`
  *  - string keys:   `floorMod(crc32(utf8 bytes), n)`
  *  - null keys route to bucket 0 (nulls never equi-join, placement just
  *    has to be deterministic)
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, key) — graft hash bucket id of key among n buckets"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, key), got ${inputType.simpleString}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType | DateType =>
        new IntegralBucket(keyType) // a date is its int32 days-since-epoch
      case StringType => new StringBucket
      case other => throw new UnsupportedOperationException(
        s"graft bucket does not support key type ${other.simpleString}")
    }
  }

  private abstract class Bound(keyType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${keyType.simpleString})"
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true
  }

  private final class IntegralBucket(keyType: DataType) extends Bound(keyType) {
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      if (input.isNullAt(1)) 0
      else {
        val v = keyType match {
          case ByteType => input.getByte(1).toLong
          case ShortType => input.getShort(1).toLong
          case IntegerType | DateType => input.getInt(1).toLong
          case _ => input.getLong(1)
        }
        GraftTable.bucketOfLong(v, n)
      }
    }
  }

  private final class StringBucket extends Bound(StringType) {
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      if (input.isNullAt(1)) 0
      else GraftTable.bucketOfUtf8(input.getUTF8String(1).getBytes, n)
    }
  }
}
