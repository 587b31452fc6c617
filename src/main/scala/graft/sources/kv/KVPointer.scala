package graft.sources.kv

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** The ONE reader/writer of a KV table's generation pointer. Both the
  * write path (write/KVStore.scala) and the scan path ([[KVLayout]])
  * resolve the live compacted generation through here, so the
  * durability rules live in exactly one place:
  *
  *  - `compacted/_graft_current.txt` holds `"<gen> <numBuckets>"` and is
  *    only ever REPLACED via tmp-file + `Files.move(ATOMIC_MOVE)` — a
  *    reader racing a compaction's publish sees the old pointer or the
  *    new one, never a truncated file (the reference's equivalent
  *    guarantee is HBase's atomic HFile bulk-load commit,
  *    HBaseTable.scala:316-344);
  *  - each generation directory carries its own
  *    `gen-<N>/_graft_meta.txt` completeness marker (written AFTER the
  *    parquet job commits, BEFORE the pointer flips). If the pointer is
  *    missing or unparseable — a crash between truncate and flush under
  *    the pre-atomic scheme, a disk-full partial write — the reader
  *    falls back to the newest generation whose marker exists and
  *    repairs the pointer, so both generation directories being intact
  *    means the table stays readable;
  *  - a legacy pre-generational layout (`compacted/_graft_buckets.txt`
  *    with bucket files directly under `compacted/`) is migrated in
  *    place to `gen-0` on first read instead of being silently invisible.
  */
object KVPointer {
  private val POINTER = "_graft_current.txt"
  private val GEN_META = "_graft_meta.txt"
  private val LEGACY = "_graft_buckets.txt"
  /** Serializes recovery/migration within this JVM; the pointer file
    * itself (atomic move) serializes across JVMs. */
  private val lock = new Object

  private def pointerFile(tablePath: String) =
    new File(s"$tablePath/compacted/$POINTER")

  /** `(generation, numBuckets)` of the live compacted state, or None if
    * the table was never compacted. Malformed pointers recover; only a
    * truly absent compacted state returns None. */
  def read(tablePath: String): Option[(Int, Int)] =
    parse(pointerFile(tablePath)).orElse(lock.synchronized {
      // re-check under the lock: another thread may have just repaired
      // or migrated, or a racing publish may have landed a valid pointer
      parse(pointerFile(tablePath))
        .orElse(recoverFromGenerations(tablePath))
        .orElse(migrateLegacy(tablePath))
    })

  /** Atomically publish `gen` as the live generation. Write-tmp +
    * ATOMIC_MOVE: readers never observe a partial pointer, and a crash
    * at any point leaves either the old pointer or the new one. */
  def publish(tablePath: String, gen: Int, numBuckets: Int): Unit = {
    val ptr = pointerFile(tablePath)
    ptr.getParentFile.mkdirs()
    val tmp = new File(ptr.getParentFile, s".$POINTER.tmp")
    Files.write(tmp.toPath, s"$gen $numBuckets".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, ptr.toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Completeness marker inside the generation directory — written after
    * the parquet job commits and before the pointer flips, so "marker
    * exists" ⇒ "directory is a complete generation" and recovery can
    * trust it. */
  def writeGenMeta(tablePath: String, gen: Int, numBuckets: Int): Unit =
    Files.write(new File(s"$tablePath/compacted/gen-$gen/$GEN_META").toPath,
      s"$numBuckets".getBytes(StandardCharsets.UTF_8))

  private def parse(f: File): Option[(Int, Int)] =
    if (!f.exists()) None
    else
      try {
        val parts = new String(Files.readAllBytes(f.toPath),
          StandardCharsets.UTF_8).trim.split(" ")
        Some((parts(0).toInt, parts(1).toInt))
      } catch { case _: Exception => None } // empty/garbage → recover below

  /** Newest complete generation: prefer its `_graft_meta.txt`; for
    * generations written before the marker existed, accept parquet's
    * `_SUCCESS` and derive the bucket count from the bucket-file names
    * (`part-..._00003.c000...` → max id + 1; compaction writes one file
    * per bucket via repartition(n, key), so every bucket is present). */
  private def recoverFromGenerations(tablePath: String): Option[(Int, Int)] = {
    val cd = new File(s"$tablePath/compacted")
    val gens = Option(cd.listFiles()).getOrElse(Array.empty[File])
      .filter(d => d.isDirectory && d.getName.matches("gen-\\d+"))
      .sortBy(-_.getName.stripPrefix("gen-").toInt)
    val recovered = gens.iterator.flatMap { d =>
      val gen = d.getName.stripPrefix("gen-").toInt
      val meta = new File(d, GEN_META)
      val fromMeta =
        if (meta.exists())
          try Some(new String(Files.readAllBytes(meta.toPath),
            StandardCharsets.UTF_8).trim.toInt)
          catch { case _: Exception => None }
        else None
      fromMeta.orElse {
        if (!new File(d, "_SUCCESS").exists()) None
        else derivedBucketCount(d)
      }.map(n => (gen, n))
    }.buffered.headOption
    recovered.foreach { case (g, n) =>
      try publish(tablePath, g, n) catch { case _: Exception => () } // repair is best-effort
    }
    recovered
  }

  private def derivedBucketCount(genDir: File): Option[Int] = {
    val pat = "_(\\d{5})\\.".r
    val ids = genDir.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .flatMap(f => pat.findFirstMatchIn(f.getName).map(_.group(1).toInt))
    if (ids.isEmpty) None else Some(ids.max + 1)
  }

  /** Pre-generational layout → `gen-0`, in place: move the bucket files
    * down, write the marker, flip the pointer, drop the legacy marker.
    * Spark bucket-file names are preserved, so the migrated directory
    * serves both the V1 bucketed-table registration and the DSv2 scan
    * unchanged. */
  private def migrateLegacy(tablePath: String): Option[(Int, Int)] = {
    val cd = new File(s"$tablePath/compacted")
    val legacy = new File(cd, LEGACY)
    if (!legacy.exists()) return None
    val n =
      try new String(Files.readAllBytes(legacy.toPath),
        StandardCharsets.UTF_8).trim.toInt
      catch {
        case e: Exception => throw new IllegalStateException(
          s"graft KV table at $tablePath has a legacy compacted layout " +
            s"with an unreadable $LEGACY — cannot migrate", e)
      }
    val gen0 = new File(cd, "gen-0")
    gen0.mkdirs()
    cd.listFiles().filter(f => f.isFile &&
      f.getName != LEGACY && f.getName != POINTER && !f.getName.endsWith(".tmp"))
      .foreach(f => Files.move(f.toPath, new File(gen0, f.getName).toPath,
        StandardCopyOption.REPLACE_EXISTING))
    writeGenMeta(tablePath, 0, n)
    publish(tablePath, 0, n)
    legacy.delete()
    Some((0, n))
  }
}
