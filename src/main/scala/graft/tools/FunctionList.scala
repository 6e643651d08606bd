package graft.tools

import graft.functions.GraftFunctions

/** Dev: regenerate FUNCTIONS.md — the full SQL function reference, straight
  * from the live catalog so it can never drift from what registers.
  * Usage: runMain graft.tools.FunctionList [outPath]
  */
object FunctionList {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "FUNCTIONS.md"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), render)
    println(s"wrote ${GraftFunctions.catalogDocs.size} functions to $out")
  }

  def render: String = {
    val docs = GraftFunctions.catalogDocs.sortBy(_._1)
    val groups = docs.groupBy { case (n, _) =>
      if (n.startsWith("st_")) "ST_ spatial functions"
      else if (n.startsWith("vec_")) "Vector functions"
      else "Sketch / hashing functions"
    }
    val sb = new StringBuilder
    sb.append("# graft SQL function reference\n\n")
    sb.append(s"${docs.size} functions, generated from the registration catalog ")
    sb.append("(`graft.tools.FunctionList`). Every name is registered by\n")
    sb.append("`GraftFunctions.register(spark)` or the `spark.sql.extensions` entry point.\n")
    for (g <- Seq("ST_ spatial functions", "Vector functions", "Sketch / hashing functions")) {
      val fns = groups.getOrElse(g, Seq.empty)
      sb.append(s"\n## $g (${fns.size})\n\n")
      sb.append("| function | usage |\n|---|---|\n")
      fns.foreach { case (n, u) =>
        sb.append(s"| `$n` | ${u.replace("|", "\\|")} |\n")
      }
    }
    sb.toString
  }
}
