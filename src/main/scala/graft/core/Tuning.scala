package graft.core

/** Session-conf derivations shared by the gate harnesses (Bench, Verify).
  *
  * Derived, not fixture constants (r17 verdict #4: a literal 2000 for
  * `spark.sql.codegen.cache.maxEntries` was exactly the conf class the
  * round had just eliminated for sim sizing and band caps — the right
  * value tracks the registered gate surface).
  */
object Tuning {
  /** Generated-class cache entries for a harness session driving `gates`
    * registered gates. Spark's default (100 LRU entries, static conf)
    * evicts a family's compiled classes before its timed gate runs once
    * the warm list grows past ~20 gates — measured r17 on
    * `dedup_minhash_append`: run1 codegen 14.0 s / 48 classes when
    * evicted vs 0.4 s when cached.
    *
    * Sizing: the settled r17 drive (334 gates) peaked at ~1400 live
    * entries under a 2000-entry cap with 228 MB of the 512 MB code-cache
    * reservation used — about 4.2 entries/gate at ~160 KB each. 6
    * entries/gate carries headroom for deeper plans; the 512 floor keeps
    * focused dev runs (a handful of gates) from thrashing either.
    */
  def codegenCacheEntries(gates: Int): Int = math.max(512, gates * 6)
}
