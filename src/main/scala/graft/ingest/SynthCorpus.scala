package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus (FIXTURES.md §4): doc content is a pure
  * function of doc index — no RNG at runtime, identical output at any
  * parallelism (the determinism half of the scaling criterion).
  *
  * 8 archetypes mirror the fixture corpus: meta-only, table-only,
  * meta+table, two-header-row table, headerless numeric, Property/Value/
  * Unit, URI/media-heavy, German-decimal. 1 in 1024 docs is a 5,000-row
  * "large doc" for skew realism.
  */
object SynthCorpus {

  private val Units = Vector("mm", "s", "h", "MPa", "kg", "V", "A", "N",
    "Hz", "W", "Pa", "K", "°C", "g", "m", "cm", "km", "bar", "J", "mol",
    "lm", "lx", "T", "Gy")
  private val Words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "sensor", "probe", "specimen", "batch", "config", "device", "channel")

  private def h(i: Long, j: Long, k: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L + j * 0xC2B2AE3D27D4EB4FL + k * 0x165667B19E3779F9L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    x & Long.MaxValue
  }

  def docText(i: Long): String = {
    val arch = (i % 8).toInt
    val big = i % 1024 == 0 && i > 0
    val rows = if (big) 5000 else 5 + (i % 37).toInt
    val sb = new StringBuilder
    def word(r: Long, c: Long) = Words((h(i, r, c) % Words.size).toInt)
    def num(r: Long, c: Long) = (h(i, r, c) % 100000).toString
    def dbl(r: Long, c: Long) = s"${h(i, r, c) % 1000}.${h(i, r, c + 7) % 1000}"
    def sci(r: Long, c: Long) = s"${1 + h(i, r, c) % 9}.${h(i, r, c + 3) % 10000}e-00${1 + h(i, r, c + 1) % 5}"
    def german(r: Long, c: Long) = s"${h(i, r, c) % 1000},${h(i, r, c + 11) % 10000}"
    def date(r: Long) = f"2023-0${1 + h(i, r, 13) % 9}%s-1${h(i, r, 17) % 10}%sT0${h(i, r, 19) % 10}%s:1${h(i, r, 23) % 5}%s:0${h(i, r, 29) % 10}%s"
    def unit(c: Long) = Units((h(i, 0, c) % Units.size).toInt)
    def mediaUrl(r: Long) = s"https://media.example/${h(i, r, 31)}"

    arch match {
      case 0 => // meta-only (colon config)
        for (r <- 0 until rows)
          sb ++= s"${word(r, 0).capitalize} ${word(r, 1)}:  ${num(r, 2)} ${unit(r)}\n"
      case 1 => // plain table with header
        sb ++= (Seq("Name") ++ (1 to 4).map(c => s"${word(100, c)} [${unit(c)}]")).mkString(";") + "\n"
        for (r <- 0 until rows)
          sb ++= (Seq(s"${word(r, 0)}_${num(r, 9)}") ++ (1 to 4).map(c => dbl(r, c))).mkString(";") + "\n"
      case 2 => // meta block + table
        for (r <- 0 until 4)
          sb ++= s"${word(r, 0).capitalize}\t${num(r, 1)} ${unit(r)}\n"
        sb ++= (Seq("Id") ++ (1 to 3).map(c => s"col${c} [${unit(c + 4)}]")).mkString("\t") + "\n"
        for (r <- 0 until rows)
          sb ++= (Seq(num(r, 0)) ++ (1 to 3).map(c => sci(r, c))).mkString("\t") + "\n"
      case 3 => // two header rows (names + units)
        sb ++= (1 to 5).map(c => s"${word(200, c)}${c}").mkString("\t") + "\n"
        sb ++= (1 to 5).map(c => unit(c)).mkString("\t") + "\n"
        for (r <- 0 until rows)
          sb ++= (1 to 5).map(c => dbl(r, c)).mkString("\t") + "\n"
      case 4 => // headerless all-numeric
        for (r <- 0 until rows)
          sb ++= (0 until 5).map(c => num(r, c)).mkString(",") + "\n"
      case 5 => // Property/Value/Unit
        sb ++= "Property,Value,Unit\n"
        for (r <- 0 until rows)
          sb ++= s"${word(r, 0).capitalize} ${word(r, 1)},${num(r, 2)},${unit(r)}\n"
      case 6 => // URI / media heavy
        sb ++= "Id;Image;ROIs;Date\n"
        for (r <- 0 until rows)
          sb ++= s"${num(r, 0)};${mediaUrl(r)};${mediaUrl(r + 7777)};${date(r)}\n"
      case 7 => // German decimals, single-comma quirk lines
        sb ++= "Zeit [s]\tKraft [N]\tWeg [mm]\n"
        for (r <- 0 until rows)
          sb ++= s"${german(r, 1)}\t${german(r, 2)}\t${german(r, 3)}\n"
    }
    sb.toString
  }

  def docId(i: Long): String = f"doc-$i%012d"

  def doc(i: Long): Doc = SpanCodec.encode(docId(i), docText(i))

  def corpus(spark: SparkSession, n: Long,
             partitions: Int = 0): Dataset[Doc] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(i => doc(i))
  }
}
