package graft.streaming

/** Starts a DebugSink and holds it open (for external client benchmarks). */
object SinkHold {
  def main(args: Array[String]): Unit = {
    val sink = new DebugSink
    println(s"SINK_URL ${sink.url}")
    Thread.sleep(120000)
    sink.stop()
  }
}
