package graft.sources

import scala.collection.mutable

/** Minimal Compound File Binary (CFB / OLE2) container reader — the
  * on-disk format wrapping legacy `.xls` (BIFF8) workbooks, implemented
  * from the public [MS-CFB] specification with no external
  * dependencies (the q-Xlsx discipline: the JDK has everything an
  * import-scale artifact needs; nothing here ever touches the 100 TB
  * path). Covers what a reader of real files must: version 3 and 4
  * sector sizes, the header + chained DIFAT, FAT chains, the directory
  * tree (scanned flat — stream names are unique per storage in the
  * files this feeds), and the miniFAT + mini stream that every
  * small-stream writer (Excel included) actually uses.
  *
  * Reference behavior: SQL_DATA_INTEGRATION_TOOL.py:557/:784 accepts
  * `*.xls` in its import dialogs (pandas/xlrd under the hood). */
object Cfb {

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE

  final case class Entry(name: String, entryType: Int, startSector: Int, size: Long)

  final class Container private[Cfb] (bytes: Array[Byte]) {
    private def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    private def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    private def u64(off: Int): Long =
      (u32(off).toLong & 0xFFFFFFFFL) | ((u32(off + 4).toLong & 0xFFFFFFFFL) << 32)

    require(bytes.length >= 512 && isCfb(bytes),
      "not a CFB (OLE2 compound) file — no D0CF11E0 signature")

    private val sectorSize = 1 << u16(0x1E)
    private val miniSectorSize = 1 << u16(0x20)
    private val numFatSectors = u32(0x2C)
    private val firstDirSector = u32(0x30)
    private val miniCutoff = u32(0x38)
    private val firstMiniFat = u32(0x3C)
    private val firstDifat = u32(0x44)
    require(sectorSize == 512 || sectorSize == 4096,
      s"unsupported CFB sector size $sectorSize")

    private def sectorOff(sid: Int): Int = (sid + 1) * sectorSize

    // DIFAT: 109 header entries, then the chained DIFAT sectors (each
    // holds sectorSize/4 - 1 FAT sector ids + a next-DIFAT pointer)
    private val fatSectorIds: IndexedSeq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109 && out.size < numFatSectors) {
        val v = u32(0x4C + 4 * i)
        if (v != FreeSect) out += v
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < (1 << 20)) {
        val base = sectorOff(difat)
        val perSector = sectorSize / 4 - 1
        var j = 0
        while (j < perSector && out.size < numFatSectors) {
          val v = u32(base + 4 * j)
          if (v != FreeSect) out += v
          j += 1
        }
        difat = u32(base + 4 * perSector)
        guard += 1
      }
      out.toIndexedSeq
    }

    private val fat: IndexedSeq[Int] =
      fatSectorIds.flatMap { sid =>
        val base = sectorOff(sid)
        (0 until sectorSize / 4).map(j => u32(base + 4 * j))
      }

    /** Follow a FAT chain, concatenating whole sectors (cycle-guarded). */
    private def chainBytes(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard <= fat.size) {
        require(sid >= 0 && sid < fat.size, s"CFB sector chain out of range: $sid")
        require(sectorOff(sid) < bytes.length,
          s"CFB truncated: sector $sid lies past the end of the file")
        out.write(bytes, sectorOff(sid), math.min(sectorSize, bytes.length - sectorOff(sid)))
        sid = fat(sid)
        guard += 1
      }
      require(guard <= fat.size, "CFB FAT chain cycle")
      out.toByteArray
    }

    val entries: IndexedSeq[Entry] = {
      val dir = chainBytes(firstDirSector)
      def du16(o: Int) = (dir(o) & 0xff) | ((dir(o + 1) & 0xff) << 8)
      (0 until dir.length / 128).flatMap { i =>
        val base = i * 128
        val nameLen = du16(base + 0x40)
        val tpe = dir(base + 0x42) & 0xff
        if (tpe == 0 || nameLen < 2 || nameLen > 64) None
        else {
          val name = new String(dir, base, nameLen - 2, "UTF-16LE")
          val start = (dir(base + 0x74) & 0xff) | ((dir(base + 0x75) & 0xff) << 8) |
            ((dir(base + 0x76) & 0xff) << 16) | ((dir(base + 0x77) & 0xff) << 24)
          val size = (0 until 8).map(j => (dir(base + 0x78 + j).toLong & 0xff) << (8 * j)).sum
          Some(Entry(name, tpe, start, size))
        }
      }
    }

    private lazy val root = entries.find(_.entryType == 5)
      .getOrElse(throw new IllegalStateException("CFB file has no root entry"))

    private lazy val miniStream: Array[Byte] = chainBytes(root.startSector)

    private lazy val miniFat: IndexedSeq[Int] =
      if (firstMiniFat == EndOfChain || firstMiniFat == FreeSect) IndexedSeq.empty
      else {
        val mf = chainBytes(firstMiniFat)
        (0 until mf.length / 4).map { j =>
          (mf(4 * j) & 0xff) | ((mf(4 * j + 1) & 0xff) << 8) |
            ((mf(4 * j + 2) & 0xff) << 16) | ((mf(4 * j + 3) & 0xff) << 24)
        }
      }

    /** Names of all stream (type-2) entries, directory order. */
    def streamNames: Seq[String] = entries.filter(_.entryType == 2).map(_.name)

    /** The named stream's bytes, from the mini stream when it is below
      * the cutoff (the layout small real-world streams actually use). */
    def stream(name: String): Array[Byte] = {
      val e = entries.find(en => en.entryType == 2 && en.name == name)
        .getOrElse(throw new IllegalArgumentException(
          s"no stream '$name' in compound file (have: ${streamNames.mkString(", ")})"))
      val raw =
        if (e.size < miniCutoff) {
          val out = new java.io.ByteArrayOutputStream()
          var sid = e.startSector
          var guard = 0
          while (sid != EndOfChain && sid != FreeSect && guard <= miniFat.size) {
            require(sid >= 0 && (sid + 1) * miniSectorSize <= miniStream.length,
              s"CFB mini chain out of range: $sid")
            out.write(miniStream, sid * miniSectorSize, miniSectorSize)
            sid = if (sid < miniFat.size) miniFat(sid) else EndOfChain
            guard += 1
          }
          out.toByteArray
        } else chainBytes(e.startSector)
      // never zero-pad a short chain to the declared size — that would
      // silently corrupt; a truncated container must fail loudly
      require(raw.length >= e.size,
        s"CFB stream '$name' truncated: chain holds ${raw.length} of ${e.size} bytes")
      java.util.Arrays.copyOf(raw, e.size.toInt)
    }
  }

  /** The D0CF11E0A1B11AE1 signature test — how callers (and the
    * Workbooks dispatcher) tell legacy .xls from zip-based .xlsx. */
  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xD0 && (bytes(1) & 0xff) == 0xCF &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xE0 &&
      (bytes(4) & 0xff) == 0xA1 && (bytes(5) & 0xff) == 0xB1 &&
      (bytes(6) & 0xff) == 0x1A && (bytes(7) & 0xff) == 0xE1

  def open(path: String): Container =
    new Container(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
