package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Subtitle cue extraction — SRT and WebVTT, the text side of a video
 * corpus: subtitle tracks are the aligned-transcript source a
 * video+text training pipeline mines, and the cue timestamps are the
 * alignment keys to the [[Mp4]]/[[Ebml]] sample tables. Auto-detects
 * the format (a `WEBVTT` first line → VTT, else SRT), parses cue
 * timings to integer milliseconds and joins multi-line cue text with
 * `\n`.
 *
 * Format facts honored:
 *   - SRT: numbered blocks separated by blank lines, `HH:MM:SS,mmm`
 *     (comma) timings — the index line is validated as digits but not
 *     trusted (renumbering is the #1 SRT corruption);
 *   - WebVTT: optional cue-identifier line, `HH:` optional in timings
 *     (dot separator), cue settings after the arrow ignored,
 *     `NOTE`/`STYLE`/`REGION` blocks skipped;
 *   - CRLF and LF both accepted; a UTF-8 BOM before `WEBVTT` accepted.
 *
 * Strict posture like the binary walkers: a malformed timing line or a
 * block that isn't a cue/comment → None for the whole document (subtitle
 * files are small; a half-parsed transcript silently misaligns
 * training pairs). A clean file with zero cues is Some(empty).
 *
 * Narrow mapPartitions — zero exchanges.
 */
object Subtitles {

  /** One cue. */
  final case class Cue(startMs: Long, endMs: Long, text: String)

  private val SrtTime =
    """(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})""".r
  private val VttTime =
    """(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})""".r

  private def srtMs(m: scala.util.matching.Regex.Match): Long =
    m.group(1).toLong * 3600000L + m.group(2).toLong * 60000L +
      m.group(3).toLong * 1000L + m.group(4).toLong

  private def vttMs(m: scala.util.matching.Regex.Match): Long =
    (if (m.group(1) == null) 0L else m.group(1).toLong * 3600000L) +
      m.group(2).toLong * 60000L + m.group(3).toLong * 1000L +
      m.group(4).toLong

  /** Parse a timing line; vtt selects separator + optional hours.
   * None on malformation. */
  private def parseTiming(line: String, vtt: Boolean): Option[(Long, Long)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val left = line.substring(0, arrow).trim
    // VTT cue settings (`position:50% line:0`) follow the end timestamp,
    // whitespace-separated; take the first token
    val rightAll = line.substring(arrow + 3).trim
    val right = rightAll.split("\\s+").headOption.getOrElse("")
    def full(re: scala.util.matching.Regex, s: String) =
      re.pattern.matcher(s).matches()
    if (vtt) {
      if (!full(VttTime, left) || !full(VttTime, right)) return None
      for {
        l <- VttTime.findFirstMatchIn(left)
        r <- VttTime.findFirstMatchIn(right)
      } yield (vttMs(l), vttMs(r))
    } else {
      if (!full(SrtTime, left) || !full(SrtTime, right) ||
        rightAll != right) return None
      for {
        l <- SrtTime.findFirstMatchIn(left)
        r <- SrtTime.findFirstMatchIn(right)
      } yield (srtMs(l), srtMs(r))
    }
  }

  /** Parse an SRT or WebVTT document. */
  def parseCues(doc: String): Option[IndexedSeq[Cue]] = {
    if (doc == null) return None
    val body =
      if (doc.startsWith("\ufeff")) doc.substring(1) else doc
    val lines = body.split("\r\n|\n|\r", -1)
    val vtt = lines.nonEmpty &&
      (lines(0) == "WEBVTT" || lines(0).startsWith("WEBVTT ") ||
        lines(0).startsWith("WEBVTT\t"))
    val cues = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var i = if (vtt) 1 else 0
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) { i += 1 }
      else {
        // start of a block
        val first = lines(i).trim
        if (vtt && (first.startsWith("NOTE") || first == "STYLE" ||
          first.startsWith("REGION"))) {
          // comment/metadata block: skip to the next blank line
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          // a cue: [identifier line] timing line, then text lines
          var timingIdx = i
          if (!lines(i).contains("-->")) {
            if (vtt) {
              // any single identifier line is legal
              timingIdx = i + 1
            } else {
              // SRT: the index line must be digits
              if (!first.forall(_.isDigit)) return None
              timingIdx = i + 1
            }
          }
          if (timingIdx >= lines.length ||
            !lines(timingIdx).contains("-->")) return None
          parseTiming(lines(timingIdx), vtt) match {
            case None => return None
            case Some((s, e)) =>
              var j = timingIdx + 1
              val text = scala.collection.mutable.ArrayBuffer.empty[String]
              while (j < lines.length && lines(j).trim.nonEmpty) {
                text += lines(j)
                j += 1
              }
              cues += Cue(s, e, text.mkString("\n"))
              i = j
          }
        }
      }
    }
    Some(cues.toIndexedSeq)
  }

  /** Output schema of [[subtitleCues]]. */
  val cueSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("cue_no", IntegerType),
    StructField("start_ms", LongType),
    StructField("end_ms", LongType),
    StructField("text", StringType)))

  /** One row per cue (document order); malformed documents contribute
   * nothing. Narrow mapPartitions. */
  def subtitleCues(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val doc = if (r.isNullAt(tIdx)) null else r.getString(tIdx)
        parseCues(doc) match {
          case Some(cs) => cs.iterator.zipWithIndex.map { case (c, i) =>
            Row(id, i, c.startMs, c.endMs, c.text)
          }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(cueSchema))
  }

  private def fmtSrt(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"

  private def fmtVtt(ms: Long, hours: Boolean): String =
    if (hours)
      f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"
    else
      f"${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"

  /** Deterministic subtitle fixture shared by the writer, the t41
   * oracle and the spec: `2 + id%3` cues, cue j spanning
   * `start = j*5000 + id%1000` → `start + 2000 + (id+j)%500` ms, text
   * `line_<id>_<j>` plus a second line `cont_<j>` when
   * `(id+j)%2 == 0` (joined `\n`). Even ids render WebVTT (hours
   * omitted when `id%4 == 0`, a NOTE block before the cues when
   * `id%4 == 2`, cue identifiers `c<j>` on every cue, a position
   * setting on cue 0), odd ids SRT (CRLF line endings when
   * `id%3 == 0`, 1-based index lines); ids with `id%7 == 5` emit a
   * header-only/empty document (zero cues, still structurally clean). */
  def syntheticSubtitle(id: Long): String = {
    val sb = new StringBuilder
    val vtt = id % 2 == 0
    val nl = if (!vtt && id % 3 == 0) "\r\n" else "\n"
    val n = if (id % 7 == 5) 0 else (2 + id % 3).toInt
    if (vtt) { sb ++= "WEBVTT"; sb ++= nl; sb ++= nl }
    if (vtt && id % 4 == 2 && n > 0) {
      sb ++= "NOTE generated fixture "; sb ++= (id % 100).toString
      sb ++= nl; sb ++= "second comment line"; sb ++= nl; sb ++= nl
    }
    (0 until n).foreach { j =>
      val start = j * 5000L + id % 1000
      val end = start + 2000 + (id + j) % 500
      if (vtt) {
        sb ++= s"c$j"; sb ++= nl
        sb ++= fmtVtt(start, hours = id % 4 != 0)
        sb ++= " --> "
        sb ++= fmtVtt(end, hours = id % 4 != 0)
        if (j == 0) sb ++= " position:50%"
        sb ++= nl
      } else {
        sb ++= (j + 1).toString; sb ++= nl
        sb ++= fmtSrt(start); sb ++= " --> "; sb ++= fmtSrt(end); sb ++= nl
      }
      sb ++= s"line_${id}_$j"; sb ++= nl
      if ((id + j) % 2 == 0) { sb ++= s"cont_$j"; sb ++= nl }
      sb ++= nl
    }
    sb.toString
  }

  /** Executor-side subtitle fixtures — the t41 oracle replays the cue
   * formulas. */
  def syntheticSubtitles(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sub_text", StringType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        Row(id, syntheticSubtitle(id))
      }
    }(Encoders.row(schema))
  }
}
