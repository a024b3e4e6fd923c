package graft.tools

/** Host compute-ceiling probe, no Spark: N threads each run an
  * identical pure-CPU loop (SHA-256 over a thread-local buffer —
  * cache-resident, no memory-bus pressure) for a fixed wall window;
  * prints aggregate and per-thread throughput. The per-thread ratio
  * between two thread counts is the HOST's scaling ceiling from turbo
  * clocking + hypervisor steal — the bound no engine running on this
  * box can beat. Usage: CpuProbe <threads> [seconds]. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val secs = if (args.length > 1) args(1).toInt else 8
    // "cpu" = L1-resident SHA loop (clock/steal ceiling); "mem" =
    // dependent pointer chase over a PER-THREAD 64 MB array (LLC +
    // memory-latency ceiling — the regime tokenize's hash maps and
    // the merge's blob handling actually live in)
    val mode = if (args.length > 2) args(2) else "cpu"
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val counts = new java.util.concurrent.atomic.AtomicLongArray(n)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        var c = 0L
        if (mode == "mem") {
          val sz = 1 << 24 // 16M ints = 64 MB per thread
          val arr = new Array[Int](sz)
          // permutation cycle for a dependent (unprefetchable) chase
          var k = 0
          while (k < sz) { arr(k) = (k + 7919) * 31 & (sz - 1); k += 1 }
          var p = i & (sz - 1)
          while (!stop.get()) {
            var j = 0
            while (j < 4096) { p = arr(p); j += 1 }
            c += 4096
          }
          if (p == -1) println("") // keep p live
        } else {
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val buf = new Array[Byte](4096)
          buf(0) = i.toByte
          while (!stop.get()) {
            md.update(buf)
            md.digest()
            c += 1
          }
        }
        counts.set(i, c)
      })
    }
    // warmup: JIT the loop before timing
    val warm = new Thread(() => {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val buf = new Array[Byte](4096)
      val end = System.nanoTime() + 2_000_000_000L
      while (System.nanoTime() < end) { md.update(buf); md.digest() }
    })
    warm.start(); warm.join()
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    Thread.sleep(secs * 1000L)
    stop.set(true)
    threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    var total = 0L
    (0 until n).foreach(i => total += counts.get(i))
    val agg = total / wall
    println(f"""{"threads":$n,"agg_hashes_per_sec":$agg%.0f,"per_thread":${agg / n}%.0f}""")
  }
}
