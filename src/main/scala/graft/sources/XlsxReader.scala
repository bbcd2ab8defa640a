package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Minimal dependency-free XLSX reader — the ingest twin of
  * `graft.sinks.Xlsx` (SURVEY.md §2.1 S3: the reference ingests Excel
  * via `readxl::read_excel(..., skip = 3, na = "x")`,
  * /root/reference/01_source_me.R:93-97).
  *
  * xlsx = a ZIP of OOXML parts; this parses the ones a reader needs:
  * `xl/workbook.xml` (sheet names → r:id), `xl/_rels/workbook.xml.rels`
  * (r:id → worksheet part), `xl/sharedStrings.xml` (string table) and
  * `xl/worksheets/sheetN.xml` (cells). Cell types handled: `inlineStr`,
  * shared strings (`t="s"`), `str` (formula cache), booleans and
  * numbers — everything both our own sink and openpyxl/openxlsx emit.
  * StAX streaming (no DOM): memory is O(row), not O(sheet).
  *
  * This is a DRIVER-side source by design, mirroring the sink's
  * rationale: Excel is a report-interchange format — single-digit MB,
  * one ZIP stream, unsplittable — so a distributed scan buys nothing.
  * The DataFrame it returns IS distributed (parallelized rows), so
  * everything downstream scales normally; bulk data lives in
  * Parquet/CSV sources.
  */
object XlsxReader {

  private val SpreadsheetNs = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zf = new ZipFile(path)
    try workbookSheets(zf).map(_._1)
    finally zf.close()
  }

  /** Raw cell grid of one sheet: rows of Option[Any] (None = blank),
    * ragged rows padded by the caller. Values come back as String,
    * Double or Boolean exactly as typed in the file.
    */
  def readSheet(path: String, sheet: Option[String] = None): Seq[Seq[Option[Any]]] = {
    val zf = new ZipFile(path)
    try {
      val sheets = workbookSheets(zf)
      require(sheets.nonEmpty, s"$path: workbook has no sheets")
      val (_, target) = sheet match {
        case Some(name) => sheets.find(_._1 == name)
          .getOrElse(sys.error(s"$path: no sheet named '$name' (have ${sheets.map(_._1).mkString(", ")})"))
        case None => sheets.head
      }
      val shared = sharedStrings(zf)
      parseSheetXml(zf.getInputStream(zf.getEntry(target)), shared)
    } finally zf.close()
  }

  /** `read_excel`-equivalent DataFrame: `skip` leading rows dropped,
    * next row is the header, `na` tokens become null, and each
    * column's type is guessed from its values (long → double →
    * boolean → string — readxl's guessing, deterministic: a column is
    * only numeric when EVERY non-null cell is).
    */
  def readXlsx(spark: SparkSession, path: String, sheet: Option[String] = None,
               skip: Int = 0, na: String = ""): DataFrame = {
    val grid = readSheet(path, sheet).drop(skip)
    require(grid.nonEmpty, s"$path: no rows after skip=$skip")
    val width = grid.map(_.size).max
    def pad(r: Seq[Option[Any]]) = r.padTo(width, None)
    val header = pad(grid.head).zipWithIndex.map {
      case (Some(v), _) => v.toString
      case (None, i)    => s"col${i + 1}"
    }
    val naOrNull: Option[Any] => Option[Any] = {
      case Some(s: String) if s == na => None
      case other                      => other
    }
    val rows = grid.tail.map(r => pad(r).map(naOrNull))

    def colVals(i: Int) = rows.iterator.map(_(i)).collect { case Some(v) => v }
    val types: Seq[DataType] = header.indices.map { i =>
      val vs = colVals(i).toSeq
      if (vs.isEmpty) StringType
      else if (vs.forall(_.isInstanceOf[Double])) {
        if (vs.forall { case d: Double => d.isWhole && math.abs(d) < 9.007199254740992e15 case _ => false })
          LongType
        else DoubleType
      }
      else if (vs.forall(_.isInstanceOf[Boolean])) BooleanType
      else StringType
    }
    val schema = StructType(header.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val data = rows.map { r =>
      org.apache.spark.sql.Row.fromSeq(r.zip(types).map {
        case (Some(d: Double), LongType)   => d.toLong
        case (Some(d: Double), DoubleType) => d
        case (Some(v), StringType)         => v.toString
        case (Some(b: Boolean), BooleanType) => b
        case (Some(v), _)                  => v.toString
        case (None, _)                     => null
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq), schema)
  }

  // ——— OOXML part parsers ———

  /** (name, worksheet zip path) per sheet, workbook order. */
  private def workbookSheets(zf: ZipFile): Seq[(String, String)] = {
    // r:id → target from the rels part
    val rels = mutable.Map[String, String]()
    val relsEntry = zf.getEntry("xl/_rels/workbook.xml.rels")
    require(relsEntry != null, "not an xlsx: missing xl/_rels/workbook.xml.rels")
    withReader(zf.getInputStream(relsEntry)) { r =>
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null)
            rels(id) = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        }
      }
    }
    val out = mutable.ArrayBuffer[(String, String)]()
    val wb = zf.getEntry("xl/workbook.xml")
    require(wb != null, "not an xlsx: missing xl/workbook.xml")
    withReader(zf.getInputStream(wb)) { r =>
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          val rid = r.getAttributeValue(RelNs, "id")
          require(rid != null, s"sheet '$name': r:id attribute missing or unbound " +
            "(worksheet must declare the relationships namespace)")
          out += ((name, rels.getOrElse(rid, sys.error(s"dangling r:id $rid"))))
        }
      }
    }
    out.toSeq
  }

  private def sharedStrings(zf: ZipFile): IndexedSeq[String] = {
    val e = zf.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val out = mutable.ArrayBuffer[String]()
    withReader(zf.getInputStream(e)) { r =>
      var inSi = false
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            inSi = true; sb.clear()
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            inSi = false; out += sb.toString
          case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
            sb.append(r.getElementText) // concatenates rich-text runs
          case _ => ()
        }
      }
    }
    out.toIndexedSeq
  }

  /** One worksheet: cells keyed by their `r` reference (A1 style) so
    * sparse rows land in the right columns.
    */
  private def parseSheetXml(in: InputStream,
                            shared: IndexedSeq[String]): Seq[Seq[Option[Any]]] = {
    val rowsOut = mutable.ArrayBuffer[Seq[Option[Any]]]()
    withReader(in) { r =>
      var row: mutable.ArrayBuffer[Option[Any]] = null
      var cellType = ""
      var cellCol = -1
      var inIs = false
      val text = new StringBuilder
      var isText = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer[Option[Any]]()
            case "c" =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(ref => colIndex(ref)).getOrElse(row.size)
              text.clear(); isText = new StringBuilder; inIs = false
            case "is" => inIs = true
            case "t" if inIs => isText.append(r.getElementText)
            case "v" => text.append(r.getElementText)
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "c" =>
              while (row.size < cellCol) row += None
              row += decodeCell(cellType, text.toString, isText.toString, inIs, shared)
              inIs = false
            case "row" => rowsOut += row.toSeq; row = null
            case _ => ()
          }
          case _ => ()
        }
      }
    }
    rowsOut.toSeq
  }

  private def decodeCell(t: String, v: String, is: String, hadIs: Boolean,
                         shared: IndexedSeq[String]): Option[Any] = t match {
    case "inlineStr"     => Some(is)
    case "s"             => if (v.isEmpty) None else Some(shared(v.trim.toInt))
    case "str"           => if (v.isEmpty && !hadIs) None else Some(if (v.nonEmpty) v else is)
    case "b"             => if (v.isEmpty) None else Some(v.trim == "1")
    case _ /* n, d */    => if (v.isEmpty) None else Some(v.trim.toDouble)
  }

  /** "BC7" → zero-based column index 54. */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def withReader(in: InputStream)(body: javax.xml.stream.XMLStreamReader => Unit): Unit = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in, "UTF-8")
    try body(r)
    finally { r.close(); in.close() }
  }
}
