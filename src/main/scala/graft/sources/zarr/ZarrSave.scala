package graft.sources.zarr

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.Deflater
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DISTRIBUTED zarr save — scida's `save()` (reference:
  * src/scida/interface.py:273 writes fields back to a zarr store, via
  * dask's chunk-parallel zarr writer). Spark-first translation:
  *
  *  - each numeric column becomes one zarr array, chunked along
  *    axis 0 with a fixed `chunkRows`;
  *  - rows are assigned to chunks by a contiguous 0-based row index
  *    (`idCol`), the frame is hash-REPARTITIONED BY CHUNK ID so every
  *    chunk's rows land in one task, and each task writes its chunks'
  *    files directly into the store — executors write in parallel,
  *    nothing flows through the driver;
  *  - store metadata (.zgroup/.zarray/.zattrs) is tiny and written
  *    driver-side, like every zarr writer's metadata path.
  *
  * The store directory must be on storage all executors share (the
  * zarr DirectoryStore contract — local FS in local mode, NFS/fuse
  * mounts on a cluster; for object stores the same chunk layout maps
  * to keys). Gaps or duplicates in the row index fail loudly rather
  * than writing a silently misaligned store.
  */
object ZarrSave {

  private def dtypeOf(dt: DataType): String = dt match {
    case DoubleType => "<f8"
    case FloatType => "<f4"
    case LongType => "<i8"
    case IntegerType => "<i4"
    case other => sys.error(s"zarr save: unsupported column type $other " +
      "(numeric columns only)")
  }

  private def elemSize(d: String): Int = d.drop(2).toInt

  def save(df: DataFrame, idCol: String, path: String,
      chunkRows: Int = 1 << 16, compress: Boolean = true,
      attrs: Map[String, Map[String, Any]] = Map.empty): Unit = {
    require(chunkRows > 0)
    val dataCols = df.schema.fields.filter(_.name != idCol)
    require(dataCols.nonEmpty, "no data columns to save")
    val dtypes = dataCols.map(f => f.name -> dtypeOf(f.dataType)).toMap

    // total rows from the index extent; contiguity is enforced
    // per-chunk below (count mismatch → loud failure)
    val Row0 = df.agg(count(lit(1)).as("n"), max(col(idCol)).as("mx")).head()
    val rows = Row0.getLong(0)
    require(rows > 0, "empty frame")
    require(Row0.get(1).toString.toLong == rows - 1,
      s"row index must be contiguous 0..${rows - 1} (max=${Row0.get(1)})")

    // driver-side metadata, executor-side chunk data
    val root = new File(path)
    ZarrStore.assertSaveTarget(root) // scida save() overwrite safety
    root.mkdirs()
    Files.writeString(new File(root, ".zgroup").toPath, """{"zarr_format": 2}""")
    attrs.get("/").foreach(a => Files.writeString(
      new File(root, ".zattrs").toPath, ZarrWriter.attrsJson(a)))
    dataCols.foreach { f =>
      val dir = new File(root, f.name)
      dir.mkdirs()
      val comp = if (compress) """{"id": "zlib", "level": 1}""" else "null"
      Files.writeString(new File(dir, ".zarray").toPath,
        s"""{"zarr_format": 2, "shape": [$rows], "chunks": [$chunkRows],
           | "dtype": "${dtypes(f.name)}", "compressor": $comp,
           | "fill_value": 0, "order": "C", "filters": null}""".stripMargin)
      attrs.get(s"/${f.name}").foreach(a => Files.writeString(
        new File(dir, ".zattrs").toPath, ZarrWriter.attrsJson(a)))
    }

    val colNames = dataCols.map(_.name)
    val colTypes = dataCols.map(f => dtypes(f.name))
    val storePath = root.getPath
    val totalRows = rows
    val cr = chunkRows
    val doCompress = compress

    df.select((col(idCol).cast("long").as("__id")) +: colNames.map(col): _*)
      .withColumn("__chunk", expr(s"__id div $cr"))
      .repartition(col("__chunk"))
      .sortWithinPartitions("__id")
      .queryExecution.toRdd // InternalRow iterator, no row copies
      .foreachPartition { it =>
        // consecutive runs of one chunk id (sorted within partition)
        var curChunk = -1L
        var filled = 0
        var bufs: Array[ByteBuffer] = null
        def flush(): Unit = if (curChunk >= 0) {
          val expect = math.min(cr.toLong, totalRows - curChunk * cr).toInt
          require(filled == expect,
            s"chunk $curChunk has $filled rows, expected $expect — row index has gaps/dups")
          colNames.indices.foreach { ci =>
            val bytes = bufs(ci).array()
            val out = if (doCompress) ZarrSave.deflate(bytes) else bytes
            Files.write(new File(s"$storePath/${colNames(ci)}/$curChunk").toPath, out)
          }
          curChunk = -1; filled = 0
        }
        while (it.hasNext) {
          val row = it.next()
          val id = row.getLong(0)
          val chunk = id / cr
          if (chunk != curChunk) {
            flush()
            curChunk = chunk
            bufs = colTypes.map(d => ByteBuffer.allocate(cr * elemSize(d))
              .order(ByteOrder.LITTLE_ENDIAN)).toArray
          }
          val inChunk = (id - chunk * cr).toInt
          require(inChunk == filled, s"row $id out of order within chunk $chunk")
          colNames.indices.foreach { ci =>
            val b = bufs(ci)
            colTypes(ci) match {
              case "<f8" => b.putDouble(inChunk * 8, row.getDouble(ci + 1))
              case "<f4" => b.putFloat(inChunk * 4, row.getFloat(ci + 1))
              case "<i8" => b.putLong(inChunk * 8, row.getLong(ci + 1))
              case "<i4" => b.putInt(inChunk * 4, row.getInt(ci + 1))
            }
          }
          filled += 1
        }
        flush()
      }
    ZarrStore.consolidate(storePath) // .zmetadata: one-read open
  }

  private[zarr] def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(1)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }
}
