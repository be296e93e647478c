package graft.sources

import scala.collection.mutable

/** Minimal Compound File Binary (MS-CFB, the OLE2 container wrapping
  * legacy `.xls` BIFF workbooks) codec — read any stream by name, write a
  * single-stream container. Dependency-free, spec-conformant where it
  * matters for interop:
  *  - reads v3 (512 B) and v4 (4096 B) sector files, DIFAT chains, and
  *    the ministream (streams under the 4096 B cutoff live in 64 B mini
  *    sectors addressed through the miniFAT — real workbooks routinely
  *    carry small auxiliary streams there);
  *  - writes v3 with the ministream rule honored, so conforming readers
  *    (xlrd et al.) accept the output.
  *
  * Reference behavior mirrored: the reference opens USDA/CFTC `.xls`
  * workbooks via xlrd (`HTGPIWASDE/__init__.py:8`,
  * `HTGPICFT/__init__.py:100`), whose compdoc module implements exactly
  * this container. Re-expressed from the public MS-CFB spec, not ported.
  */
private[graft] object Cfb {

  private val Signature =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private[graft] def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private[graft] def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** One directory entry we care about. */
  private case class Entry(name: String, objType: Int, start: Int, size: Long)

  /** Every stream in the container, by name. */
  def readStreams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(bytes.length >= 512 &&
      Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a CFB (OLE2) file — bad signature")
    val sectorShift = u16(bytes, 30)
    require(sectorShift == 9 || sectorShift == 12, s"bad sector shift $sectorShift")
    val sectorSize = 1 << sectorShift
    val miniSize = 1 << u16(bytes, 32)
    val numFat = i32(bytes, 44)
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)

    def sectorBytes(n: Int): Array[Byte] = {
      val off = (n + 1) * sectorSize
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + sectorSize, bytes.length))
    }

    // FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && fatSectors.size < numFat) {
      val v = i32(bytes, 76 + 4 * i)
      if (v >= 0) fatSectors += v
      i += 1
    }
    var difat = firstDifat
    var guard = 0
    while (difat != EndOfChain && difat >= 0 && guard < (1 << 20)) {
      val sec = sectorBytes(difat)
      val perSec = sectorSize / 4 - 1
      var j = 0
      while (j < perSec && fatSectors.size < numFat) {
        val v = i32(sec, 4 * j)
        if (v >= 0) fatSectors += v
        j += 1
      }
      difat = i32(sec, sectorSize - 4)
      guard += 1
    }

    val fat = fatSectors.toArray.flatMap { s =>
      val sec = sectorBytes(s)
      (0 until sec.length / 4).map(j => i32(sec, 4 * j))
    }

    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = start
      val seen = mutable.Set.empty[Int]
      while (s != EndOfChain && s >= 0 && s < fat.length) {
        require(seen.add(s), s"cyclic FAT chain at sector $s")
        out += s
        s = fat(s)
      }
      // a chain may only END at ENDOFCHAIN (or never start: FREESECT on an
      // empty stream); running off the FAT table means the header's FAT
      // sector count understates the chain — fail loudly, a silent
      // truncation here decodes to wrong cell data downstream
      require(s == EndOfChain || (s == -1 && out.isEmpty),
        s"FAT chain from sector $start leaves the table at $s " +
          s"(fat entries: ${fat.length}) — corrupt or truncated container")
      out.toSeq
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach(s => out.write(sectorBytes(s)))
      val all = out.toByteArray
      if (size >= 0 && size < all.length)
        java.util.Arrays.copyOfRange(all, 0, size.toInt)
      else all
    }

    // directory entries (128 B each)
    val dirBytes = readChain(firstDir, -1L)
    val entries = (0 until dirBytes.length / 128).flatMap { k =>
      val off = k * 128
      val nameLen = u16(dirBytes, off + 64)
      val objType = dirBytes(off + 66) & 0xFF
      if (nameLen < 2 || objType == 0) None
      else {
        val name = new String(dirBytes, off, nameLen - 2, "UTF-16LE")
        // v3 writers may leave garbage in the high size half — mask it
        val size =
          if (sectorShift == 9) i32(dirBytes, off + 120).toLong & 0xFFFFFFFFL
          else (i32(dirBytes, off + 120).toLong & 0xFFFFFFFFL) |
            ((i32(dirBytes, off + 124).toLong & 0xFFFFFFFFL) << 32)
        Some(Entry(name, objType, i32(dirBytes, off + 116), size))
      }
    }

    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root storage entry"))
    lazy val miniStream = readChain(root.start, root.size)
    lazy val miniFat: Array[Int] = {
      if (firstMiniFat == EndOfChain || firstMiniFat < 0) Array.empty
      else {
        val raw = readChain(firstMiniFat, -1L)
        (0 until raw.length / 4).map(j => i32(raw, 4 * j)).toArray
      }
    }

    def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      val seen = mutable.Set.empty[Int]
      while (s != EndOfChain && s >= 0 && s < miniFat.length) {
        require(seen.add(s), s"cyclic miniFAT chain at mini sector $s")
        val off = s * miniSize
        out.write(java.util.Arrays.copyOfRange(miniStream, off,
          math.min(off + miniSize, miniStream.length)))
        s = miniFat(s)
      }
      // same loud-failure contract as chain(): a sub-cutoff stream whose
      // chain leaves the miniFAT (including a container with NO miniFAT)
      // must not decode as empty/truncated bytes
      require(s == EndOfChain || (s == -1 && size == 0L),
        s"miniFAT chain from mini sector $start leaves the table at $s " +
          s"(miniFat entries: ${miniFat.length}) — corrupt container")
      val all = out.toByteArray
      if (size < all.length) java.util.Arrays.copyOfRange(all, 0, size.toInt)
      else all
    }

    entries.filter(_.objType == 2).map { e =>
      val data =
        if (e.size >= miniCutoff) readChain(e.start, e.size)
        else readMiniChain(e.start, e.size)
      e.name -> data
    }.toMap
  }

  // ---- writing ------------------------------------------------------------

  /** A v3 (512 B sector) container holding exactly one stream. Streams
    * under the 4096 B cutoff go to the ministream (the spec's rule —
    * conforming readers interpret the start sector of a small stream as a
    * MINI sector number, so writing it to regular sectors would corrupt). */
  def write(streamName: String, data: Array[Byte]): Array[Byte] = {
    val S = 512
    require(data.length < 6 * 1000 * 1000,
      "single-header DIFAT writer caps streams at ~6 MB")
    val useMini = data.length < 4096

    def ceilDiv(a: Int, b: Int) = (a + b - 1) / b

    // sector counts; FAT size depends on the total, so iterate to fixpoint
    val nMini = if (useMini) math.max(ceilDiv(data.length, 64), 1) else 0
    val miniStreamLen = nMini * 64
    val nMiniStreamSectors = if (useMini) ceilDiv(miniStreamLen, S) else 0
    val nMiniFatSectors = if (useMini) ceilDiv(nMini * 4, S) else 0
    val nDataSectors = if (useMini) 0 else ceilDiv(data.length, S)
    var nFat = 1
    var stable = false
    while (!stable) {
      val total = nFat + 1 + nMiniFatSectors + nMiniStreamSectors + nDataSectors
      val need = math.max(ceilDiv(total * 4, S), 1)
      if (need == nFat) stable = true else nFat = need
    }
    require(nFat <= 109, "stream too large for header-resident DIFAT")

    // layout: [FAT x nFat][dir][miniFAT...][ministream... | data...]
    val dirSector = nFat
    val firstMiniFat = dirSector + 1
    val firstContent = firstMiniFat + nMiniFatSectors
    val totalSectors = firstContent + nMiniStreamSectors + nDataSectors

    val fat = Array.fill(nFat * (S / 4))(FreeSect)
    (0 until nFat).foreach(i => fat(i) = FatSect)
    fat(dirSector) = EndOfChain
    (0 until nMiniFatSectors).foreach { i =>
      fat(firstMiniFat + i) =
        if (i == nMiniFatSectors - 1) EndOfChain else firstMiniFat + i + 1
    }
    val contentCount = nMiniStreamSectors + nDataSectors
    (0 until contentCount).foreach { i =>
      fat(firstContent + i) =
        if (i == contentCount - 1) EndOfChain else firstContent + i + 1
    }

    val out = new java.io.ByteArrayOutputStream((totalSectors + 1) * S)
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }

    // header
    out.write(Signature)
    (0 until 16).foreach(_ => w8(0)) // CLSID
    w16(0x003E); w16(0x0003)         // minor, major (v3)
    w16(0xFFFE)                      // little-endian
    w16(9); w16(6)                   // sector 512, mini 64
    (0 until 6).foreach(_ => w8(0))
    w32(0)                           // dir sector count (0 in v3)
    w32(nFat)
    w32(dirSector)
    w32(0)                           // transaction sig
    w32(4096)                        // mini cutoff
    w32(if (useMini) firstMiniFat else EndOfChain)
    w32(nMiniFatSectors)
    w32(EndOfChain); w32(0)          // no DIFAT sectors
    (0 until 109).foreach(i => w32(if (i < nFat) i else FreeSect))

    // FAT sectors
    fat.foreach(w32)

    // directory sector: Root Entry, the stream, two free slots
    def dirEntry(name: String, objType: Int, child: Int, start: Int,
        size: Long): Unit = {
      val utf16 = name.getBytes("UTF-16LE")
      require(utf16.length <= 62, s"stream name too long: $name")
      out.write(utf16)
      (utf16.length until 64).foreach(_ => w8(0))
      w16(if (name.isEmpty) 0 else utf16.length + 2)
      w8(objType)
      w8(1)                          // black
      w32(-1); w32(-1); w32(child)   // left, right, child
      (0 until 16).foreach(_ => w8(0)) // CLSID
      w32(0)                         // state
      w32(0); w32(0); w32(0); w32(0) // times
      w32(start)
      w32((size & 0xFFFFFFFFL).toInt); w32(0)
    }
    dirEntry("Root Entry", 5, 1,
      if (useMini) firstContent else EndOfChain,
      if (useMini) miniStreamLen.toLong else 0L)
    dirEntry(streamName, 2, -1,
      if (useMini) 0 else firstContent, data.length.toLong)
    dirEntry("", 0, -1, 0, 0L)
    dirEntry("", 0, -1, 0, 0L)

    // miniFAT + ministream (or the data chain directly)
    if (useMini) {
      (0 until nMini).foreach(i => w32(if (i == nMini - 1) EndOfChain else i + 1))
      // unused miniFAT slots are FREESECT per MS-CFB, like the main FAT
      // above — zero-fill would read as "next mini sector = 0" and a
      // strict validator can reject the container or mis-walk a chain
      // into slot 0 (r14 review)
      (nMini until nMiniFatSectors * (S / 4)).foreach(_ => w32(FreeSect))
      out.write(data)
      (data.length until nMiniStreamSectors * S).foreach(_ => w8(0))
    } else {
      out.write(data)
      (data.length until nDataSectors * S).foreach(_ => w8(0))
    }
    out.toByteArray
  }
}
