package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Md5Partition
import graft.functions.Md5Partition.md5_partition

/** Golden vectors from the reference's Partitioner.test.ts:18-38. */
class PartitionerSpec extends SparkSpec {

  private val golden = Array(6, 7, 4, 4, 9, 1, 8, 0, 6, 6, 7, 6, 7, 3, 2, 2, 0, 9, 4, 9, 9, 5, 5,
    1, 7, 3, 0, 6, 5, 6, 3, 6, 3, 5, 6, 2, 3, 6, 7, 2, 1, 3, 2, 7, 1, 1, 5, 1, 4, 0, 1, 9, 7,
    4, 2, 3, 2, 9, 7, 7, 4, 3, 5, 4, 5, 3, 9, 0, 4, 8, 1, 7, 4, 8, 1, 2, 9, 9, 5, 3, 5, 0, 9,
    4, 3, 9, 6, 7, 8, 6, 4, 6, 0, 1, 1, 5, 8, 3, 9, 7)

  test("static partition function reproduces the 100 golden md5 vectors") {
    val got = (0 until 100).map(i => Md5Partition.partition(UTF8String.fromString(s"key-$i"), 10))
    assert(got == golden.toSeq)
  }

  test("partitionCount 1 always returns 0") {
    (0 until 100).foreach { i =>
      assert(Md5Partition.partition(UTF8String.fromString(s"foo$i"), 1) == 0)
    }
  }

  test("md5_partition column expression matches goldens under codegen") {
    val got = spark.range(100)
      .select(md5_partition(concat(lit("key-"), col("id").cast("string")), lit(10)).as("p"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == golden.toSeq)
  }

  test("null key yields null") {
    val r = spark.range(1)
      .select(md5_partition(lit(null).cast("string"), lit(10)).as("p"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("partitionOrSpread: keyed rows route by key, keyless rows spread") {
    val rows = spark.range(200)
      .select(
        when(col("id") % 2 === 0, concat(lit("key-"), col("id").cast("string")))
          .as("key"), // odd ids: no partition key
        col("id").cast("string").as("nonce"))
      .select(col("key"),
        Md5Partition.partitionOrSpread(col("key"), lit(10), col("nonce")).as("p"))
      .collect()
    assert(rows.forall(r => { val p = r.getInt(1); p >= 0 && p < 10 }))
    // keyed rows match the plain partitioner exactly
    val keyed = rows.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    keyed.foreach { case (k, p) =>
      assert(p == Md5Partition.partition(UTF8String.fromString(k), 10))
    }
    // keyless rows spread over many partitions (uniform-ish, deterministic)
    val keyless = rows.filter(_.isNullAt(0)).map(_.getInt(1))
    assert(keyless.distinct.length >= 8)
  }
}
