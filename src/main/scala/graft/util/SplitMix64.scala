package graft.util

/** Deterministic, allocation-free PRNG used by every synthetic-data path.
  *
  * All corpus/fixture generation must be reproducible per (seed, rowId)
  * independent of partitioning, so each row derives its own stream:
  * `SplitMix64.stream(seed, rowId)`. Never seeded from wall-clock.
  *
  * Algorithm: public-domain SplitMix64 (Steele, Lea & Flood, "Fast
  * Splittable Pseudorandom Number Generators", OOPSLA'14).
  */
final class SplitMix64(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, bound). bound > 0. */
  def nextInt(bound: Int): Int = {
    // rejection-free modulo is fine for our non-cryptographic use;
    // bias is < 2^-32 for bounds << 2^32.
    val v = nextLong() >>> 1
    (v % bound).toInt
  }

  /** Uniform double in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

object SplitMix64 {
  /** Mix two longs into one well-distributed seed. */
  def mix(a: Long, b: Long): Long = {
    var z = a ^ (b * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-row generator: identical output for (seed, rowId) regardless of
    * which partition/task evaluates it. */
  def stream(seed: Long, rowId: Long): SplitMix64 = new SplitMix64(mix(seed, rowId))
}
