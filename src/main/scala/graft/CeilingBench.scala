package graft

/** The machine's own CPU-scaling ceiling, measured rather than assumed
  * (round-1 VERDICT item #2): a pure cache-resident integer workload
  * (splitmix64 chains — zero allocation, zero memory traffic beyond a
  * few cache lines per thread) run at two thread counts in one JVM.
  * Whatever the VM loses here (hypervisor steal at full occupancy, SMT
  * sharing, frequency scaling) is unavailable to ANY job on this box,
  * so `job efficiency / ceiling efficiency` is the recorded acceptance
  * ratio for the north rule's two-cluster-size criterion whenever the
  * ceiling itself is below the 0.8 bar (see BASELINE.md BENCH section).
  *
  *   sbt -batch "runMain graft.CeilingBench 8 32 6"
  *
  * prints one JSON line with Mops/s at both levels and the efficiency.
  */
object CeilingBench {

  /** One chunk of the workload; returns a value so JIT can't elide it. */
  private def chunk(seed: Long, iters: Int): Long = {
    var z = seed
    var i = 0
    while (i < iters) {
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= (z >>> 31)
      z += 0x9e3779b97f4a7c15L
      i += 1
    }
    z
  }

  @volatile private var sink = 0L

  /** Total Mops/s with `threads` workers running until the deadline. */
  private def mopsAt(threads: Int, secs: Double): Double = {
    val chunkIters = 1 << 20
    val deadline = System.nanoTime() + (secs * 1e9).toLong
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val ts = (0 until threads).map { ti =>
      val t = new Thread(() => {
        var local = 0L
        var z = 0x243f6a8885a308d3L + ti
        while (System.nanoTime() < deadline) {
          z = chunk(z, chunkIters)
          local += chunkIters
        }
        sink ^= z
        counts.set(ti, local)
      })
      t.start(); t
    }
    ts.foreach(_.join())
    // deadline-bounded: wall time == secs (overshoot <= 1 chunk ~ 2 ms)
    val total = (0 until threads).map(counts.get).sum
    total / secs / 1e6
  }

  /** Memory-bandwidth ceiling: threads stream disjoint stripes of a
    * shared 2 GB array (sequential 64-bit reads — the access pattern of
    * a shuffle/encode pipeline) until the deadline. Returns GB/s.
    */
  private def memGbsAt(data: Array[Long], threads: Int, secs: Double): Double = {
    val deadline = System.nanoTime() + (secs * 1e9).toLong
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val stripe = data.length / threads
    val ts = (0 until threads).map { ti =>
      val t = new Thread(() => {
        val from = ti * stripe
        val until = from + stripe
        var bytes = 0L
        var acc = 0L
        while (System.nanoTime() < deadline) {
          var i = from
          while (i < until) { acc += data(i); i += 1 }
          bytes += stripe.toLong * 8
        }
        sink ^= acc
        counts.set(ti, bytes)
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (0 until threads).map(counts.get).sum / secs / 1e9
  }

  /** Allocation/GC ceiling: threads allocate short-lived small object
    * graphs (strings + arrays — the analyzer's allocation profile) as
    * fast as the heap allows. Returns GB allocated per second.
    */
  private def allocGbsAt(threads: Int, secs: Double): Double = {
    val deadline = System.nanoTime() + (secs * 1e9).toLong
    val counts = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val ts = (0 until threads).map { ti =>
      val t = new Thread(() => {
        var bytes = 0L
        var acc = 0L
        val keep = new Array[Object](256) // small live window
        var k = 0
        while (System.nanoTime() < deadline) {
          val a = new Array[Int](16)          // ~80 B
          a(ti & 15) = k
          val s = java.lang.Long.toString(bytes ^ acc) // small string alloc
          acc += s.length + a(0)
          keep(k & 255) = s
          k += 1
          bytes += 80 + 48
        }
        sink ^= acc
        counts.set(ti, bytes)
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (0 until threads).map(counts.get).sum / secs / 1e9
  }

  def main(args: Array[String]): Unit = {
    val lo = args.lift(0).map(_.toInt).getOrElse(8)
    val hi = args.lift(1).map(_.toInt).getOrElse(32)
    val secs = args.lift(2).map(_.toDouble).getOrElse(6.0)
    mopsAt(hi, 2.0) // JIT warm-up at full occupancy
    // interleave trials lo/hi twice, keep the best of each (neighbors
    // on a shared VM add noise in one direction only)
    val loM = Seq(mopsAt(lo, secs), mopsAt(lo, secs)).max
    val hiM = Seq(mopsAt(hi, secs), mopsAt(hi, secs)).max
    val eff = (hiM / loM) / (hi.toDouble / lo)
    // memory-bandwidth ceiling (the binding resource of the encode/
    // shuffle pipeline once cores stop being the bottleneck)
    val data = new Array[Long](1 << 28) // 2 GB, shared, read-only
    java.util.Arrays.fill(data, 0x9e3779b97f4a7c15L)
    memGbsAt(data, hi, 2.0) // fault+warm
    val loG = Seq(memGbsAt(data, lo, secs), memGbsAt(data, lo, secs)).max
    val hiG = Seq(memGbsAt(data, hi, secs), memGbsAt(data, hi, secs)).max
    val memEff = (hiG / loG) / (hi.toDouble / lo)
    // allocation/GC ceiling (the analyzer's profile: short-lived
    // strings + small arrays at full rate)
    allocGbsAt(hi, 2.0) // warm
    val loA = Seq(allocGbsAt(lo, secs), allocGbsAt(lo, secs)).max
    val hiA = Seq(allocGbsAt(hi, secs), allocGbsAt(hi, secs)).max
    val allocEff = (hiA / loA) / (hi.toDouble / lo)
    println(f"""{"metric":"cpu_scaling_ceiling","lo_threads":$lo,"hi_threads":$hi,"lo_mops":$loM%.1f,"hi_mops":$hiM%.1f,"ceiling_efficiency":$eff%.3f,"lo_mem_gbs":$loG%.1f,"hi_mem_gbs":$hiG%.1f,"mem_bw_scaling":$memEff%.3f,"lo_alloc_gbs":$loA%.1f,"hi_alloc_gbs":$hiA%.1f,"alloc_scaling":$allocEff%.3f,"sink":$sink}""")
  }
}
