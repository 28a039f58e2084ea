package graft

/** Per-JVM fixture cache for READ-path bench queries whose lakehouse
  * fixture is a pure function of the input data dir (q89's bloom
  * sidecars, q102/q106/q110's registered catalog tables): build it
  * ONCE per (query, dir) so the bench's warm-up and timed passes time
  * the pruned READ the entry exists to measure, not a repeated fixture
  * commit — the s36/s37 drain/probe lesson, applied to fixtures
  * (r13 verdict's "minor" note). Write-path entries (q103/q107/...)
  * keep rebuilding per invocation: the write IS what they time, and a
  * mutated table cannot be reused.
  *
  * Correctness is untouched: Verify runs each query once, and a cached
  * fixture is byte-identical to a rebuilt one (same deterministic
  * inputs, same commit sequence). */
object FixtureCache {
  private val built =
    scala.collection.concurrent.TrieMap.empty[String, Any]

  /** Build-once keyed by (query, data dir); `build` must be a pure
    * function of the key. */
  def once[T](query: String, dir: String)(build: => T): T =
    built.getOrElseUpdate(s"$query|$dir", build).asInstanceOf[T]
}
