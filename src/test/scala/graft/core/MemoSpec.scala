package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MemoSpec extends SparkSpec {

  test("cached memoizes per (name, session, dir), persists, and reports " +
      "builds exactly once via drainBuilt") {
    import spark.implicits._
    Memo.drainBuilt() // isolate from other suites sharing the session
    var builds = 0
    def frame = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = Memo.cached("spec.memo", spark, "/dirA")(frame)
    val b = Memo.cached("spec.memo", spark, "/dirA")(frame)
    assert(builds == 1)           // second call served from the memo
    assert(a eq b)                // the same persisted frame, not a copy
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    val c = Memo.cached("spec.memo", spark, "/dirB")(frame)
    assert(builds == 2)           // a different dir is a different entry
    assert(c.count() == 3)
    // attribution: one event per build, drained once
    val events = Memo.drainBuilt()
    assert(events == Seq("spec.memo:/dirA", "spec.memo:/dirB"))
    assert(Memo.drainBuilt().isEmpty)
    Memo.clear(spark)
  }

  test("clear unpersists and forgets the session's entries") {
    import spark.implicits._
    val df = Memo.cached("spec.clear", spark, "/dirC")(Seq(1).toDF("x"))
    assert(df.storageLevel.useMemory || df.storageLevel.useDisk)
    Memo.clear(spark)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // next access rebuilds (and re-registers the event)
    Memo.drainBuilt()
    Memo.cached("spec.clear", spark, "/dirC")(Seq(1).toDF("x"))
    assert(Memo.drainBuilt() == Seq("spec.clear:/dirC"))
    Memo.clear(spark)
  }

  test("ownedPersist registers operator-internal persists for the " +
      "session clear, and clearDir leaves them alone") {
    import spark.implicits._
    val df = Memo.ownedPersist(Seq(1, 2).toDF("x"))
    assert(df.storageLevel.useMemory || df.storageLevel.useDisk)
    assert(df.count() == 2)
    // clearDir must NOT touch owned frames (no dir key; fresh op calls
    // rebuild fresh frames, so there is no staleness path through them)
    Memo.clearDir("/anywhere")
    assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // the session clear (Bench's warmup release) evicts them
    Memo.clear(spark)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("clearDir drops entries for a rewritten fixture dir: a rewrite-" +
      "then-read sees the new rows, other dirs stay cached") {
    import spark.implicits._
    Memo.drainBuilt()
    val dir = java.nio.file.Files.createTempDirectory("memo_rw").toString
    def readTbl = spark.read.parquet(s"$dir/t.parquet")
    Seq(1, 2).toDF("x").write.mode("overwrite").parquet(s"$dir/t.parquet")
    val v1 = Memo.cached("spec.rw", spark, dir)(readTbl)
    assert(v1.count() == 2)
    val other = Memo.cached("spec.other", spark, "/dirD")(Seq(9).toDF("x"))
    other.count()
    // rewrite the fixture in place, then invalidate exactly that dir
    Seq(1, 2, 3, 4, 5).toDF("x").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    Memo.clearDir(dir)
    assert(v1.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val v2 = Memo.cached("spec.rw", spark, dir)(readTbl)
    assert(v2.count() == 5)       // fresh read, not the stale 2-row cache
    assert(other.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    Memo.clear(spark)
  }

  test("cached is re-entrancy safe: a build may itself consult the memo") {
    import spark.implicits._
    Memo.drainBuilt()
    // Nested cached() inside a build — the pattern recsys.neighbors →
    // recsys.baskets uses; forbidden under computeIfAbsent, fine under
    // get-then-putIfAbsent.
    val outer = Memo.cached("spec.outer", spark, "/dirE") {
      val inner = Memo.cached("spec.inner", spark, "/dirE")(Seq(1, 2).toDF("x"))
      inner.withColumn("y", col("x") * 2)
    }
    assert(outer.count() == 2)
    assert(Memo.drainBuilt().toSet ==
      Set("spec.inner:/dirE", "spec.outer:/dirE"))
    Memo.clear(spark)
  }

  test("a throwing build leaves no entry and no phantom cache_cold event") {
    import spark.implicits._
    Memo.drainBuilt()
    intercept[RuntimeException] {
      Memo.cached("spec.boom", spark, "/dirF") {
        throw new RuntimeException("build failed")
      }
    }
    assert(Memo.drainBuilt().isEmpty)   // no phantom attribution
    // the key is free: a later successful build lands normally
    val ok = Memo.cached("spec.boom", spark, "/dirF")(Seq(7).toDF("x"))
    assert(ok.count() == 1)
    assert(Memo.drainBuilt() == Seq("spec.boom:/dirF"))
    Memo.clear(spark)
  }
}
