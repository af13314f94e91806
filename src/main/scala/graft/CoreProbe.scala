package graft

/** Pure-core thread-scaling probe (no Spark): runMain graft.CoreProbe <threads> <docs> */
object CoreProbe {
  def main(args: Array[String]): Unit = {
    val nThreads = args(0).toInt
    val docs = args(1).toLong
    val dict = graft.link.UnitDict.default
    // warmup
    (0L until 500L).foreach { i =>
      val lines = graft.ingest.SpanCodec.lines(graft.ingest.SynthCorpus.doc(i).spans)
      val m = graft.annotate.Annotator.annotate(s"doc-$i", lines, "utf-8", dict)
      graft.rdf.TripleExpand.expandDoc(m, lines)
    }
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val next = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val threads = (0 until nThreads).map { _ =>
      new Thread(() => {
        var i = next.getAndIncrement()
        while (i < docs) {
          val d = graft.ingest.SynthCorpus.doc(i)
          val lines = graft.ingest.SpanCodec.lines(d.spans)
          val m = graft.annotate.Annotator.annotate(d.doc_id, lines, "utf-8", dict)
          counter.addAndGet(graft.rdf.TripleExpand.expandDoc(m, lines).size.toLong)
          i = next.getAndIncrement()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[core] threads=$nThreads docs=$docs t=$secs%.1f s rate=${docs / secs}%.0f docs/s triples=${counter.get}")
  }
}
