package graft
import org.apache.spark.sql.functions._
object RepBench {
  def main(args: Array[String]): Unit = {
    (1 to 4).foreach { i =>
      val t = DecompBench.run(32, "full")
      println(f"[rep] run$i full@32 = $t%.1f s")
    }
    (1 to 2).foreach { i =>
      val t = DecompBench.run(8, "full")
      println(f"[rep] run$i full@8 = $t%.1f s")
    }
  }
}
