package graft.streaming

import graft.sources.kv.GraftFs

/** Deterministic ordering for staged stream-source directories.
  *
  * Spark's file stream source orders files by MODIFICATION TIME (path
  * breaks ties), so a staging sequence that relies on "written later ⇒
  * picked up later" is racy: two writes landing within one filesystem
  * clock tick tie on mtime, and the tie-break (path — effectively a
  * random UUID part-file name) can process a flush SENTINEL before the
  * real events it is supposed to close, advancing the watermark so the
  * real rows are dropped as late. [[ordered]] removes the race by
  * STAMPING each staging step's new files with a strictly increasing
  * mtime, making the intended pickup order explicit instead of
  * clock-dependent.
  */
object Staging {

  /** Run `steps` sequentially, each writing files into `dir`; after
    * each step the files it created are stamped `t0 + step·1s`, so the
    * file source replays steps in exactly this order (ties impossible).
    * `t0` is the wall clock at call time — staged dirs persist across
    * runs and the stamps persist with them. */
  def ordered(dir: String)(steps: (() => Unit)*): Unit = {
    val t0 = System.currentTimeMillis()
    var seen = Set.empty[String]
    steps.zipWithIndex.foreach { case (step, i) =>
      step()
      val files = GraftFs.dataFiles(dir).map(_.path)
      files.filterNot(seen).foreach(
        GraftFs.setModifiedTime(_, t0 + i * 1000L))
      seen = files.toSet
    }
  }
}
