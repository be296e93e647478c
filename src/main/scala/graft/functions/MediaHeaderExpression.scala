package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static audio/video container-header parsers — the WAV/RIFF + ISO BMFF
  * (MP4) + EBML/Matroska (mkv/webm) siblings of [[ImageHeaderOps]]
  * (r15 VERDICT depth item 7; mkv r17 item 6).
  * PUBLIC formats only (RIFF/WAVE per the Microsoft/IBM 1991 multimedia
  * programming interface spec; ISO/IEC 14496-12 box structure; RFC 8794
  * EBML + the Matroska element registry), parsed
  * dependency-free with the same discipline: every read bounds-checked,
  * ANY malformation — truncated RIFF payload, fmt chunk too short, a box
  * whose declared size overruns the buffer, an mvhd cut mid-field —
  * returns null rather than throwing, so one corrupt blob in a 100 TB
  * scan costs one null row, never a task retry storm.
  *
  * These are the header fields a training-data pipeline FILTERS av media
  * by (sample rate / channel count / duration / container brand) before
  * spending decode compute; sample/frame decode stays out of scope — the
  * container ships no codecs (same posture as image pixel decode).
  */
object MediaHeaderOps {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def utf8(s: String): Any =
    if (s == null) null else UTF8String.fromString(s)

  private def row(format: String, durationMs: Any, channels: Any,
      sampleRate: Any, bits: Any, brand: String,
      codec: String): GenericInternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format),
      durationMs, channels, sampleRate, bits, utf8(brand), utf8(codec)))

  /** WAV: "RIFF" + le32 payload size + "WAVE", then an even-padded chunk
    * walk. Requires a complete RIFF payload (declared size within the
    * buffer), a "fmt " chunk of ≥ 16 bytes with nonzero channels and
    * sample rate, and a "data" chunk (its declared size may legally
    * overhang EOF only as the LAST chunk of a still-recording file — here
    * that is malformation: the 100 TB posture wants truncation loud).
    * duration_ms = data bytes × 1000 / byte rate, floor. The brand column
    * carries the fmt tag ("pcm", "ieee_float", "alaw", "mulaw",
    * "extensible", else "fmt_<code>").
    *
    * RF64 (EBU Tech 3306, the >4 GiB broadcast-WAV variant a 100 TB AV
    * crawl actually meets — r16 VERDICT item 6): fourcc "RF64", the
    * 32-bit RIFF and data size fields hold the 0xFFFFFFFF sentinel, and
    * the REAL 64-bit sizes live in a mandatory `ds64` chunk that must be
    * the first chunk after the form type. Both indirections are resolved
    * here with the same truncation-loud bounds (a JVM byte array caps a
    * single cell at 2 GiB, so what this buys in practice is correct
    * parsing of RF64-written files of any size whose bytes fit, and a
    * loud null — not garbage sizes — on header-only prefixes). Format
    * stays "wav"; a missing/short/second-position ds64 is malformation. */
  def wav(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 44) return null
    val isRf64 = b(0) == 'R' && b(1) == 'F' && b(2) == '6' && b(3) == '4'
    if (!isRf64 &&
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'))
      return null
    var riffSize = le32(b, 4)
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return null
    var data64 = -1L
    if (isRf64) {
      // the 32-bit size field MUST be the sentinel and ds64 MUST lead
      if (riffSize != 0xFFFFFFFFL) return null
      if (b.length < 12 + 8 + 28 || fourcc(b, 12) != "ds64") return null
      val dsSize = le32(b, 16)
      if (dsSize < 28 || 20 + dsSize > b.length) return null
      riffSize = le64(b, 20) // real RIFF payload size
      data64 = le64(b, 28) // real data-chunk size
      if (data64 < 0) return null
    }
    if (riffSize < 4 || 8 + riffSize > b.length) return null // truncated
    val end = (8 + riffSize).toInt
    var i = 12
    var fmtTag = -1
    var channels = -1
    var sampleRate = -1L
    var byteRate = -1L
    var bits = -1
    var dataBytes = -1L
    while (i + 8 <= end) {
      val cid = fourcc(b, i)
      var csize = le32(b, i + 4)
      // RF64 data chunk carries the sentinel; substitute the ds64 size
      // for BOTH the overrun check and the walk advance
      if (isRf64 && cid == "data" && csize == 0xFFFFFFFFL) csize = data64
      if (csize < 0 || i + 8 + csize > end) return null // chunk overrun
      if (cid == "fmt ") {
        if (csize < 16) return null
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (cid == "data") {
        dataBytes = csize
      }
      i += 8 + csize.toInt
      if ((csize & 1L) == 1L) i += 1 // chunks are even-padded
    }
    if (fmtTag < 0 || dataBytes < 0) return null // fmt or data missing
    // sampleRate is a u32 read as Long: a crafted rate ≥ 2^31 would pass
    // a plain <= 0 guard and wrap negative at .toInt below — range-check
    // it here; bits = 0 is equally garbage (r16 ADVICE: null-on-malformed
    // means null, not wrapped/zero metadata)
    if (channels <= 0 || sampleRate <= 0 || sampleRate > Int.MaxValue ||
      bits <= 0) return null
    val brand = fmtTag match {
      case 1 => "pcm"
      case 3 => "ieee_float"
      case 6 => "alaw"
      case 7 => "mulaw"
      case 0xfffe => "extensible"
      case t => s"fmt_$t"
    }
    val durationMs: Any =
      if (byteRate > 0) java.lang.Long.valueOf(dataBytes * 1000L / byteRate)
      else null
    // for RIFF the fmt tag IS the codec; codec stays an mp4-side column
    row("wav", durationMs, Integer.valueOf(channels),
      Integer.valueOf(sampleRate.toInt), Integer.valueOf(bits), brand, null)
  }

  /** ISO BMFF (MP4/MOV family): a top-level box walk that must tile the
    * buffer exactly — be32 size + fourcc type per box, size 1 → 64-bit
    * largesize, size 0 → extends to EOF (legal only for the last box),
    * any overrun/underrun → null. The FIRST box must be `ftyp` (its
    * major brand is the row's `brand`). duration_ms comes from
    * `moov`/`mvhd` when present (version 0: u32 timescale/duration at
    * payload +12/+16; version 1: +20/+24 with u64 duration), floor-scaled
    * to ms; a brand-only fragment (no moov, e.g. an init segment) keeps
    * duration null rather than failing the row. */
  def mp4(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 16) return null
    // walk one box level [from, until); returns (type, payloadFrom,
    // payloadUntil) via callback, false on structural malformation
    def walk(from: Int, until: Int)(
        f: (String, Int, Int) => Unit): Boolean = {
      var i = from
      while (i < until) {
        if (i + 8 > until) return false
        val size32 = be32(b, i)
        val typName = fourcc(b, i + 4)
        if (!typName.forall(c => c >= 0x20 && c < 0x7f)) return false
        var header = 8
        var boxEnd = 0L
        if (size32 == 0L) boxEnd = until // to end (last box only)
        else if (size32 == 1L) {
          if (i + 16 > until) return false
          header = 16
          boxEnd = i + be64(b, i + 8)
        } else boxEnd = i + size32
        if (boxEnd < i + header || boxEnd > until) return false
        f(typName, i + header, boxEnd.toInt)
        i = boxEnd.toInt
      }
      true
    }
    // first box must be ftyp with a printable major brand
    if (fourcc(b, 4) != "ftyp") return null
    var brand: String = null
    var durationMs: Any = null
    var moovBad = false
    // fragmented-MP4 state (r16 VERDICT item 6): mvhd timescale (for the
    // mvex/mehd total), per-track media timescales (trun durations are in
    // the TRACK's timescale), accumulated moof ticks per track, and the
    // honesty flags — fragBad marks structural moof corruption (null
    // row), fragUnknown marks a traf whose duration is underivable (no
    // per-sample durations and no tfhd default → duration stays null,
    // row alive, same posture as a brand-only fragment)
    var mvhdTs = -1L
    var mehdDur = -1L
    var fragBad = false
    var fragUnknown = false
    var sawMoof = false
    val trackTs = scala.collection.mutable.HashMap.empty[Long, Long]
    val fragTicks = scala.collection.mutable.HashMap.empty[Long, Long]
    val codecs = scala.collection.mutable.LinkedHashSet.empty[String]
    // trak → mdia → minf → stbl → stsd: each level is one more box walk;
    // the first sample entry's fourcc is the track's codec identifier
    // (avc1/hvc1/mp4a/…, ISO 14496-12 §8.5.2). A level that does not
    // tile marks the row corrupt, same as moov itself.
    def descend(from: Int, until: Int, path: List[String]): Unit = path match {
      case Nil =>
        // stsd payload: version+flags (4) + entry_count (4) +
        // first entry header (size 4 + fourcc 4)
        if (until - from >= 16 && be32(b, from + 4) >= 1L) {
          val c = fourcc(b, from + 12)
          if (c.forall(ch => ch >= 0x20 && ch < 0x7f)) codecs += c
        }
      case next :: rest =>
        // evaluate the walk FIRST: `moovBad |= !walk(...)` reads the old
        // flag before the callback can set it, losing inner failures
        val tiled = walk(from, until) { (t, f, u) =>
          if (t == next) descend(f, u, rest)
        }
        if (!tiled) moovBad = true
    }
    val ok = walk(0, b.length) { (typ, pFrom, pUntil) =>
      if (typ == "ftyp" && brand == null) {
        if (pUntil - pFrom >= 8) brand = fourcc(b, pFrom)
      } else if (typ == "moov") {
        // a moov whose interior does not tile cleanly is corruption, not
        // merely "no duration" — fail the row (walk evaluated before the
        // flag update, same ordering hazard as in descend)
        val moovTiled = walk(pFrom, pUntil) { (ityp, iFrom, iUntil) =>
          if (ityp == "mvhd" && durationMs == null) {
            val ver = if (iFrom < iUntil) b(iFrom) & 0xff else -1
            // all-ones duration (0xFFFFFFFF v0 / 2^64-1 v1) is the ISO
            // 14496-12 "duration unknown" sentinel, not a real value —
            // leave duration_ms null like a brand-only fragment rather
            // than scaling it into a ~4.3M-second phantom (r16 ADVICE)
            if (ver == 0 && iFrom + 24 <= iUntil) {
              val ts = be32(b, iFrom + 12)
              val dur = be32(b, iFrom + 16)
              if (ts > 0) mvhdTs = ts
              if (ts > 0 && dur != 0xFFFFFFFFL) durationMs =
                java.lang.Long.valueOf(dur * 1000L / ts)
            } else if (ver == 1 && iFrom + 32 <= iUntil) {
              val ts = be32(b, iFrom + 20)
              val dur = be64(b, iFrom + 24) // -1L = all-ones sentinel
              if (ts > 0) mvhdTs = ts
              if (ts > 0 && dur >= 0) durationMs = java.lang.Long.valueOf(
                dur / ts * 1000L + (dur % ts) * 1000L / ts)
            }
          } else if (ityp == "trak") {
            descend(iFrom, iUntil, List("mdia", "minf", "stbl", "stsd"))
            // track_id (tkhd) ↔ media timescale (mdia/mdhd) for the moof
            // trun math; same tiling discipline as the codec descent
            var tkId = -1L
            val trakTiled = walk(iFrom, iUntil) { (t2, f2, u2) =>
              if (t2 == "tkhd" && tkId < 0) {
                val v2 = if (f2 < u2) b(f2) & 0xff else -1
                if (v2 == 0 && f2 + 16 <= u2) tkId = be32(b, f2 + 12)
                else if (v2 == 1 && f2 + 24 <= u2) tkId = be32(b, f2 + 20)
              } else if (t2 == "mdia") {
                val mdiaTiled = walk(f2, u2) { (t3, f3, u3) =>
                  if (t3 == "mdhd") {
                    val v3 = if (f3 < u3) b(f3) & 0xff else -1
                    val ts3 =
                      if (v3 == 0 && f3 + 16 <= u3) be32(b, f3 + 12)
                      else if (v3 == 1 && f3 + 24 <= u3) be32(b, f3 + 20)
                      else -1L
                    if (tkId >= 0 && ts3 > 0) trackTs(tkId) = ts3
                  }
                }
                if (!mdiaTiled) moovBad = true
              }
            }
            if (!trakTiled) moovBad = true
          } else if (ityp == "mvex") {
            // movie-extends: mehd fragment_duration (in mvhd timescale)
            // is the fMP4 total when mvhd's own duration is 0/unknown
            val mvexTiled = walk(iFrom, iUntil) { (t2, f2, u2) =>
              if (t2 == "mehd") {
                val v2 = if (f2 < u2) b(f2) & 0xff else -1
                if (v2 == 0 && f2 + 8 <= u2) mehdDur = be32(b, f2 + 4)
                else if (v2 == 1 && f2 + 12 <= u2) mehdDur = be64(b, f2 + 4)
              }
            }
            if (!mvexTiled) moovBad = true
          }
        }
        if (!moovTiled) moovBad = true
      } else if (typ == "moof") {
        sawMoof = true
        // movie fragment: per-traf ticks = Σ trun sample durations when
        // the 0x100 flag carries them, else sample_count × the tfhd
        // default (0x8 flag); neither present → duration underivable
        // (fragUnknown), structural overrun → corrupt row (fragBad)
        val moofTiled = walk(pFrom, pUntil) { (ityp, iFrom, iUntil) =>
          if (ityp == "traf") {
            var tfTrack = -1L
            var tfDefDur = -1L
            val trafTiled = walk(iFrom, iUntil) { (t2, f2, u2) =>
              if (t2 == "tfhd") {
                if (u2 - f2 < 8) fragBad = true
                else {
                  val flags = be32(b, f2) & 0xffffffL
                  tfTrack = be32(b, f2 + 4)
                  var off = f2 + 8L
                  if ((flags & 0x1L) != 0) off += 8 // base-data-offset
                  if ((flags & 0x2L) != 0) off += 4 // sample-descr-index
                  if ((flags & 0x8L) != 0) {
                    if (off + 4 <= u2) tfDefDur = be32(b, off.toInt)
                    else fragBad = true
                  }
                }
              } else if (t2 == "trun") {
                if (u2 - f2 < 8) fragBad = true
                else {
                  val flags = be32(b, f2) & 0xffffffL
                  val n = be32(b, f2 + 4)
                  var off = f2 + 8L
                  if ((flags & 0x1L) != 0) off += 4 // data-offset
                  if ((flags & 0x4L) != 0) off += 4 // first-sample-flags
                  val stride = 4L * java.lang.Long.bitCount(flags & 0xf00L)
                  if ((flags & 0x100L) != 0) {
                    if (off + n * stride > u2) fragBad = true
                    else {
                      var k = 0L; var idx = off
                      var ticks = 0L
                      while (k < n) {
                        ticks += be32(b, idx.toInt); idx += stride; k += 1
                      }
                      if (tfTrack >= 0) fragTicks(tfTrack) =
                        fragTicks.getOrElse(tfTrack, 0L) + ticks
                      else fragBad = true // trun before any tfhd
                    }
                  } else if (tfDefDur >= 0 && tfTrack >= 0)
                    fragTicks(tfTrack) =
                      fragTicks.getOrElse(tfTrack, 0L) + n * tfDefDur
                  else fragUnknown = true
                }
              }
            }
            if (!trafTiled) fragBad = true
          }
        }
        if (!moofTiled) fragBad = true
      }
    }
    if (!ok || moovBad || fragBad || brand == null ||
      !brand.forall(c => c >= 0x20 && c < 0x7f)) return null
    // duration precedence: a positive mvhd duration is authoritative;
    // else the mvex/mehd fragment total (mvhd timescale); else the moof
    // sum — max over tracks of its accumulated ticks in ITS media
    // timescale (tracks run in parallel), defined only when every traf
    // was derivable and every referenced track has a known timescale.
    if (durationMs == null || durationMs.asInstanceOf[Long] == 0L) {
      if (mvhdTs > 0 && mehdDur > 0) durationMs = java.lang.Long.valueOf(
        mehdDur / mvhdTs * 1000L + (mehdDur % mvhdTs) * 1000L / mvhdTs)
      else if (fragTicks.nonEmpty && !fragUnknown &&
        fragTicks.keys.forall(trackTs.contains)) {
        val ms = fragTicks.map { case (tk, ticks) =>
          val ts = trackTs(tk)
          ticks / ts * 1000L + (ticks % ts) * 1000L / ts
        }.max
        durationMs = java.lang.Long.valueOf(ms)
      } else if (sawMoof || mehdDur >= 0) durationMs = null
      // ^ a FRAGMENTED file whose total is underivable: mvhd's 0 is the
      //   fMP4 "see fragments" placeholder, not a real zero — report
      //   unknown; a plain movie with mvhd duration 0 keeps its 0
    }
    // '+'-joined distinct track codecs in trak order ("avc1+mp4a"); null
    // when no trak carries a sample description (brand-only fragments)
    val codec = if (codecs.isEmpty) null else codecs.mkString("+")
    row("mp4", durationMs, null, null, null, brand, codec)
  }

  /** EBML/Matroska (mkv/webm — the one mainstream AV container family
    * q252's matrix was missing, r17 VERDICT item 6). PUBLIC structure:
    * RFC 8794 EBML (VINT-coded element IDs and sizes) + the Matroska
    * element registry. Parsed with the same discipline as the siblings:
    * every VINT and payload bounds-checked, any structural malformation
    * → null row; an ABSENT field (no Duration element, no audio track)
    * keeps the row alive with that column null, like mp4's brand-only
    * init segments.
    *
    * Fields: `format` = "mkv", `brand` = the EBML DocType ("webm" /
    * "matroska"), `duration_ms` = Segment→Info Duration (a float, in
    * TimestampScale-ns ticks; default scale 1e6 ns), channels /
    * sample_rate / bits from the FIRST TrackEntry→Audio element, codec =
    * '+'-joined distinct CodecID strings in track order ("V_VP9+A_OPUS").
    *
    * Unknown-size elements (VINT of all ones — the live-streaming form)
    * are accepted for Segment and Cluster only, extending to the end of
    * their level; the metadata elements (Info/Tracks) precede clusters
    * in any muxer's output, so nothing this parser reads sits past one. */
  def ebml(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 12) return null
    if ((be32(b, 0) & 0xffffffffL) != 0x1A45DFA3L) return null
    // VINT descriptor length from the first byte: position of the
    // leading 1 bit (0x80→1 … 0x01→8); 0x00 is invalid
    def vintLen(first: Int): Int =
      if (first == 0) -1 else Integer.numberOfLeadingZeros(first) - 23
    var docType: String = null
    var tsScale = 1000000L // ns per tick — the Matroska default
    var durTicks = Double.NaN
    var channels = -1L
    var rate = Double.NaN
    var bitDepth = -1L
    // first-AUDIO-ELEMENT-wins, not per-field first-wins: per-field
    // guards would blend fields from different tracks' Audio elements
    // into one chimera row (e.g. bits from a PCM commentary track on an
    // Opus main track — review r18)
    var sawAudio = false
    var bad = false
    val codecs = scala.collection.mutable.LinkedHashSet.empty[String]
    def uintAt(from: Int, until: Int): Long = {
      if (until - from > 8) { bad = true; return -1L }
      var v = 0L; var k = from
      while (k < until) { v = (v << 8) | (b(k) & 0xff); k += 1 }
      v
    }
    def floatAt(from: Int, until: Int): Double = until - from match {
      case 4 => java.lang.Float.intBitsToFloat(be32(b, from).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(be64(b, from))
      case 0 => 0.0 // zero-length EBML element: value 0
      case _ => { bad = true; Double.NaN }
    }
    def strAt(from: Int, until: Int): String =
      new String(b, from, until - from, "US-ASCII").takeWhile(_ != 0)
    // walk one element level [from, until): VINT id (marker kept, ≤ 4
    // bytes) + VINT size (marker stripped, ≤ 8 bytes) + payload. All-ones
    // size = "unknown" — legal only for ids in allowUnknown, and then the
    // element extends to the end of this level (so it is its level's
    // last). Returns false on malformation.
    def walk(from: Int, until: Int, allowUnknown: Set[Long])(
        f: (Long, Int, Int) => Unit): Boolean = {
      var i = from
      while (i < until) {
        val idLen = vintLen(b(i) & 0xff)
        if (idLen < 1 || idLen > 4 || i + idLen > until) return false
        var id = 0L
        var k = 0
        while (k < idLen) { id = (id << 8) | (b(i + k) & 0xff); k += 1 }
        val j = i + idLen
        if (j >= until) return false
        val szLen = vintLen(b(j) & 0xff)
        if (szLen < 1 || szLen > 8 || j + szLen > until) return false
        var size = ((b(j) & 0xff) & ((1 << (8 - szLen)) - 1)).toLong
        k = 1
        while (k < szLen) { size = (size << 8) | (b(j + k) & 0xff); k += 1 }
        val pFrom = j + szLen
        val pUntil =
          if (size == (1L << (7 * szLen)) - 1) { // all data bits set
            if (!allowUnknown.contains(id)) return false
            until
          } else {
            val e = pFrom.toLong + size
            if (e > until) return false
            e.toInt
          }
        f(id, pFrom, pUntil)
        i = pUntil
      }
      true
    }
    val SEGMENT = 0x18538067L
    val CLUSTER = 0x1F43B675L
    val ok = walk(0, b.length, Set(SEGMENT)) { (id, f, u) =>
      if (id == 0x1A45DFA3L) { // EBML header
        if (!walk(f, u, Set.empty) { (i2, f2, u2) =>
          if (i2 == 0x4282L && docType == null) docType = strAt(f2, u2)
        }) bad = true
      } else if (id == SEGMENT) {
        if (!walk(f, u, Set(CLUSTER)) { (i2, f2, u2) =>
          if (i2 == 0x1549A966L) { // Info
            if (!walk(f2, u2, Set.empty) { (i3, f3, u3) =>
              if (i3 == 0x2AD7B1L) { // TimestampScale
                val v = uintAt(f3, u3)
                if (v > 0) tsScale = v else bad = true
              } else if (i3 == 0x4489L && durTicks.isNaN) // Duration
                durTicks = floatAt(f3, u3)
            }) bad = true
          } else if (i2 == 0x1654AE6BL) { // Tracks
            if (!walk(f2, u2, Set.empty) { (i3, f3, u3) =>
              if (i3 == 0xAEL) { // TrackEntry
                if (!walk(f3, u3, Set.empty) { (i4, f4, u4) =>
                  if (i4 == 0x86L) { // CodecID
                    val c = strAt(f4, u4)
                    if (c.nonEmpty &&
                      c.forall(ch => ch >= 0x20 && ch < 0x7f)) codecs += c
                    else bad = true
                  } else if (i4 == 0xE1L && !sawAudio) { // FIRST Audio wins
                    sawAudio = true
                    if (!walk(f4, u4, Set.empty) { (i5, f5, u5) =>
                      if (i5 == 0xB5L && rate.isNaN) // SamplingFrequency
                        rate = floatAt(f5, u5)
                      else if (i5 == 0x9FL && channels < 0) // Channels
                        channels = uintAt(f5, u5)
                      else if (i5 == 0x6264L && bitDepth < 0) // BitDepth
                        bitDepth = uintAt(f5, u5)
                    }) bad = true
                  }
                }) bad = true
              }
            }) bad = true
          }
        }) bad = true
      }
    }
    if (!ok || bad || docType == null || docType.isEmpty ||
      !docType.forall(c => c >= 0x20 && c < 0x7f)) return null
    // ±Inf and out-of-Long-range floats are malformation, not values —
    // floor(Inf).toLong would saturate to Long.MaxValue and emit a
    // phantom ~292-million-year duration (review r18; same posture as
    // the WAV wrapped-u32 sample rate)
    val durMsD = durTicks * tsScale / 1e6
    val durationMs: Any =
      if (durTicks.isNaN || durTicks < 0 || durTicks.isInfinite ||
        durMsD >= Long.MaxValue.toDouble) null
      else java.lang.Long.valueOf(math.floor(durMsD).toLong)
    def posInt(v: Long): Any =
      if (v > 0 && v <= Int.MaxValue) Integer.valueOf(v.toInt) else null
    val rateInt: Any =
      if (!rate.isNaN && rate > 0 && rate <= Int.MaxValue)
        Integer.valueOf(rate.toInt)
      else null
    row("mkv", durationMs, posInt(channels), rateInt, posInt(bitDepth),
      docType, if (codecs.isEmpty) null else codecs.mkString("+"))
  }

  /** Sniff by signature, then parse; unrecognized or malformed → null. */
  def meta(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 12) return null
    if ((b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' ||
      b(0) == 'R' && b(1) == 'F' && b(2) == '6' && b(3) == '4') &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') wav(b)
    else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') mp4(b)
    else if ((be32(b, 0) & 0xffffffffL) == 0x1A45DFA3L) ebml(b)
    else null
  }
}

/** `media_meta(binary)` → `struct<format string, duration_ms bigint,
  * channels int, sample_rate int, bits int, brand string, codec string>`
  * (codec = '+'-joined distinct trak sample-entry fourccs for mp4, e.g.
  * "avc1+mp4a"; "V_VP9+A_OPUS"-style CodecIDs for mkv/webm; null for wav —
  * the fmt tag in `brand` IS wav's codec id), null when the
  * payload is not a recognized well-formed WAV/MP4/Matroska header.
  * Codegen'd (the
  * generated code calls [[MediaHeaderOps.meta]] directly), so an
  * audio-duration filter over billions of blobs runs at scan speed with
  * zero row-format boundary — same contract as [[ImageMeta]]. */
case class MediaMeta(child: Expression) extends UnaryExpression {
  override def prettyName: String = "media_meta"
  override def nullable: Boolean = true
  override def dataType: DataType = MediaMeta.schema
  override def nullSafeEval(v: Any): Any =
    MediaHeaderOps.meta(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaHeaderOps.meta($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): MediaMeta =
    copy(child = newChild)
}

object MediaMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("duration_ms", LongType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("brand", StringType),
    StructField("codec", StringType)))

  def column(payload: Column): Column =
    GraftBridge.column(MediaMeta(GraftBridge.expression(payload)))
}
