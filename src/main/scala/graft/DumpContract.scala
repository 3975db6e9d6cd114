package graft
import java.nio.file.{Files, Paths}
/** Scratch: dump the driver contract (query keys + oracle SQL) without
  * running any query — the before/after fingerprint for registry refactors. */
object DumpContract {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/contract.txt")
    val sb = new StringBuilder
    SparkEntry.queries.keys.toSeq.sorted.foreach(k => sb.append(s"Q $k\n"))
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(s"O $k ${java.util.Base64.getEncoder.encodeToString(v.getBytes("UTF-8"))}\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"dumped ${SparkEntry.queries.size} queries, ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
