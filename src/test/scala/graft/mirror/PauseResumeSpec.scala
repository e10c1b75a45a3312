package graft.mirror

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

class PauseResumeSpec extends SparkSpec {

  test("pause stops intake; resume continues from the checkpoint") {
    val wal = tmpDir("prwal")
    val base = tmpDir("prmir")
    val cfg = MirrorConfig(wal, s"$base/raw", s"$base/dest", s"$base/ckpt",
      Seq("id"), StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "d")
    def rec(cp: Long, d: String) =
      ChangeRecord(0, cp, cp.toString, cp * 1000, cp, "t", "d", d, null, Nil)

    val runner = new MirrorRunner(spark, cfg)
    val h = runner.handle(Trigger.ProcessingTime(100))

    ChangeLogWal.append(wal, Seq(rec(1, """{"id":1,"v":1}""")))
    h.resume()
    eventually(runner.destination().count() == 1, "first record")
    h.pause()
    assert(!h.isActive)

    // records arriving while paused are NOT consumed...
    ChangeLogWal.append(wal, Seq(rec(2, """{"id":2,"v":2}""")))
    Thread.sleep(500)
    assert(runner.destination().count() == 1)

    // ...until resume, which picks up from the checkpointed offset
    h.resume()
    eventually(runner.destination().count() == 2, "post-resume record")
    h.pause()
  }

  private def eventually(cond: => Boolean, what: String,
      timeoutMs: Long = 30000): Unit = {
    val t0 = System.currentTimeMillis()
    // destination() is unreadable until the first merge lands — treat
    // any read failure as "not yet".
    def ok: Boolean = scala.util.Try(cond).getOrElse(false)
    while (!ok) {
      if (System.currentTimeMillis() - t0 > timeoutMs)
        fail(s"timed out waiting for $what")
      Thread.sleep(200)
    }
  }
}
