package graft

import java.nio.file.Files

import graft.util.ShuffleScaling
import org.scalatest.funsuite.AnyFunSuite

class ShuffleScalingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("initialPartitions: proportional between floor and cap") {
    assert(ShuffleScaling.initialPartitions(0L, 32) == 32)
    assert(ShuffleScaling.initialPartitions(10L << 20, 32) == 32) // below floor
    assert(ShuffleScaling.initialPartitions(2048L << 20, 32) == 512) // 2 GB / 4 MB
    assert(ShuffleScaling.initialPartitions(Long.MaxValue / 4, 32)
      == ShuffleScaling.MaxPartitions)
  }

  test("inputBytes walks recursively; tuneFor sets the AQE knob") {
    val dir = Files.createTempDirectory("shufscale").toFile
    val sub = new java.io.File(dir, "sub"); sub.mkdirs()
    Files.write(new java.io.File(dir, "a.bin").toPath, new Array[Byte](1000))
    Files.write(new java.io.File(sub, "b.bin").toPath, new Array[Byte](500))
    assert(ShuffleScaling.inputBytes(dir.getAbsolutePath) == 1500L)
    assert(ShuffleScaling.inputBytes(dir.getAbsolutePath + "/nope") == 0L)

    val before = spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    try {
      val n = ShuffleScaling.tuneFor(spark, dir.getAbsolutePath)
      // tiny dir → floor = session shuffle partitions
      assert(n == spark.conf.get("spark.sql.shuffle.partitions").toInt)
      assert(spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum") == n.toString)
    } finally before match {
      case Some(v) => spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", v)
      case None => spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    }
  }
}
