package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract): Verify restricted to a
  * query-name prefix/list for fast oracle iteration on new queries.
  * Usage: runMain graft.Scratch <sfDir> <outDir> <name1,name2|prefix>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, sel) = args
    val wanted = sel.split(",").toSet
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), "8", "graft-scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val defs = SparkEntry.defs.filter(q =>
      wanted.contains(q.name) || wanted.exists(w => q.name.startsWith(w)))
    defs.foreach { q =>
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/${q.name}")
        println(f"[scratch] ${q.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        println(s"[scratch] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = defs.flatMap(q => q.oracle.map(o => s"${esc(q.name)}: ${esc(o)}"))
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
