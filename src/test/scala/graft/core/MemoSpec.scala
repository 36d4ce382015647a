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
}
