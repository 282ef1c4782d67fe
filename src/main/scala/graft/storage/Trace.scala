package graft.storage

/** Dev-only driver-side phase tracer for the commit path. Off (zero
  * cost beyond one boolean test) unless the JVM runs with env
  * `GRAFT_TRACE=1` — used by `tools/run.sh graft.tools.Profile*` to
  * attribute wall-time inside a single txn commit (staging write,
  * stats pass, footer reads, CAS) without touching the measured code
  * shape. Never enabled by Bench/Verify. */
private[graft] object Trace {
  val enabled: Boolean = sys.env.contains("GRAFT_TRACE")
  def apply[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[trace] $name%-44s $dt%7.3f s")
      r
    }
}
