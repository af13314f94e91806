package graft

/** One-shot probe: runMain graft.ScaleProbe <cpus> <docs> */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val docs = args(1).toLong
    val (t, h, n) = ScalingBench.run(cpus, docs)
    println(f"[probe] cpus=$cpus docs=$docs t=$t%.1f s rate=${docs / t}%.0f docs/s triples=$n hash=$h")
  }
}
