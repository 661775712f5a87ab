package graft.streaming

import org.apache.spark.sql.SparkSession

/** The cloned-session recipe every streaming twin runs under — ONE place
  * (it was three hand-maintained copies, and one had already drifted by
  * dropping the timezone pin; r11 review).
  *
  * Why a clone at all: a stateful streaming query instantiates state stores
  * per shuffle partition, so the partition count is a per-stream throughput
  * knob, not a session constant — sizing it on the caller's shared session
  * would re-plan any query planned concurrently there (ADVICE r7).
  * `newSession()` shares the SparkContext but isolates the SQLConf.
  *
  * What must carry over from the caller:
  *   - `spark.sql.legacy.parquet.nanosAsLong` — the adaptive events.ts
  *     decode branches on it (TESTDATA: the ts encoding changed across
  *     driver regens);
  *   - `spark.sql.session.timeZone` — NTZ→TIMESTAMP decode is zone-
  *     sensitive; the caller pins UTC and the clone must agree or epoch
  *     values silently shift by the JVM-default zone offset.
  */
object StreamSession {

  def cloned(spark: SparkSession, shufflePartitions: Int): SparkSession = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.legacy.parquet.nanosAsLong",
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"))
    sess.conf.set("spark.sql.session.timeZone",
      spark.conf.get("spark.sql.session.timeZone", "UTC"))
    sess.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    sess
  }
}
