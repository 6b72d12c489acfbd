package graft.tools

/** Scratch probe for the q182 sf0.1 decode-null repro (not a test). */
object GifProbe {
  def main(args: Array[String]): Unit = {
    for (id <- Seq(1144L, 4290L, 0L, 143L, 286L, 429L)) {
      val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
      val g = graft.expressions.GifBytes.build(w, h, id)
      val d = graft.expressions.GifDecode.decode(g)
      val idx = (0 until w * h).map(i =>
        graft.expressions.GifBytes.pixelIndex(id, i)).mkString("")
      println(s"id=$id ${w}x$h decode=${if (d == null) "NULL" else "ok"} idx=$idx")
    }
  }
}
