package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running (count, sum) as a Spark 4 `StatefulProcessor`
  * (SURVEY.md §2.8 ST5, `transformWithState` variant). State is one
  * (Long, Double) per key in the RocksDB store; emits the updated stat for
  * every key seen in the micro-batch. */
class RunningStatProcessor
    extends StatefulProcessor[Long, (Long, Double), Streams.UserStat] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[(Long, Double)]("stat",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                               timers: TimerValues): Iterator[Streams.UserStat] = {
    var (n, s) = if (state.exists()) state.get() else (0L, 0.0)
    rows.foreach { r => n += 1; s += r._2 }
    state.update((n, s))
    Iterator(Streams.UserStat(key, n, s))
  }
}
