package graft.sinks

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal `TableCatalog` over a warehouse directory of graft block
  * stores, so the connector works through the modern `writeTo` API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", dir)
  *   blocks.writeTo("graft.blocks").create()   // or .append()
  * }}}
  *
  * A table named `a.b.t` lives at `<warehouse>/a/b/t`; its schema is
  * the store's recorded `_graft_log/_schema` (written by `createTable`
  * or the first commit). Rename/alter are unsupported — stores are
  * append-only directories (matching the reference's fixed DynamoDB
  * tables).
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option 'warehouse'"))
  }
  override def name(): String = catalogName

  private def hconf() = SparkSession.active.sessionState.newHadoopConf()
  private def tablePath(ident: Identifier): Path =
    new Path((warehouse +: ident.namespace().toSeq :+ ident.name())
      .mkString("/"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = dir.getFileSystem(hconf())
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      (catalogName +: namespace.toSeq).toArray)
    // a store directory's INTERNALS (data/, _staging/, _graft_log/)
    // must not surface as phantom tables when the namespace path IS a
    // table root — writing to one would corrupt the store's layout.
    // `data` is only excluded when this dir is itself a store (has a
    // _graft_log child), so a genuine table named "data" under a plain
    // namespace still lists.
    val dirIsStore = fs.exists(new Path(dir, GraftBlocksLog.LogDirName))
    fs.listStatus(dir).filter(_.isDirectory)
      .filterNot(s => s.getPath.getName.startsWith("_") ||
        s.getPath.getName.startsWith(".") ||
        (dirIsStore && s.getPath.getName == "data"))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    val fs = p.getFileSystem(hconf())
    if (!fs.exists(p)) throw new NoSuchTableException(ident.asInstanceOf[Identifier])
    val schema = GraftBlocksLog.readSchema(fs, p)
      .getOrElse(GraftBlocksTableSink.DefaultSchema)
    new GraftBlocksTableSink(p.toString, schema, "blockBatch")
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty, "graft-blocks tables are unpartitioned")
    val p = tablePath(ident)
    val fs = p.getFileSystem(hconf())
    if (fs.exists(p)) throw new TableAlreadyExistsException(
      ident.asInstanceOf[Identifier])
    fs.mkdirs(p)
    GraftBlocksLog.writeSchemaIfAbsent(fs, p, schema)
    new GraftBlocksTableSink(p.toString, schema, "blockBatch")
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-blocks stores are append-only; ALTER is unsupported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    val fs = p.getFileSystem(hconf())
    fs.exists(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft-blocks stores are append-only; RENAME is unsupported")
}
