package graft

import scala.io.StdIn
import graft.sources.Catalog

/** Interactive client shell — the analog of the reference DFS CLI
  * (reference: dfs/client/cli.go ls/upload/download/stats loop), with
  * SQL as the query surface instead of job submission.
  *
  * Commands:
  *   ls                      list tables in the data dir
  *   stats                   per-table rows + bytes (footer metadata)
  *   download <tbl> <dir>    reassemble a table to one local file
  *   delete <tbl>            drop a table's files
  *   help                    this text
  *   exit | quit             leave
  *   anything else           executed as Spark SQL over the registered tables
  *
  * Usage: runMain graft.Shell [dataDir]
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.session(master = "local[*]", appName = "graft-shell")
    val cat = new Catalog(spark, dir)
    cat.registerAll()
    println(s"graft shell — ${cat.list().size} tables from $dir (help for commands)")

    var running = true
    while (running) {
      print("graft> ")
      Console.out.flush()
      val line = Option(StdIn.readLine()).map(_.trim).orNull
      if (line == null) running = false
      else if (line.nonEmpty) try {
        line.split("\\s+").toList match {
          case ("exit" | "quit") :: Nil => running = false
          case "help" :: Nil =>
            println("ls | stats | nodes | download <tbl> <dir> | delete <tbl> | exit | <sql>")
          case "ls" :: Nil => cat.list().foreach(println)
          case "stats" :: Nil => cat.stats().show(100, truncate = false)
          case "nodes" :: Nil => cat.executorStats().show(100, truncate = false)
          case "download" :: tbl :: dest :: Nil =>
            cat.download(tbl, dest); println(s"downloaded $tbl -> $dest")
          case "delete" :: tbl :: Nil =>
            println(if (cat.delete(tbl)) s"deleted $tbl" else s"no such table: $tbl")
          case _ => spark.sql(line).show(50, truncate = false)
        }
      } catch {
        case e: Exception => println(s"error: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
