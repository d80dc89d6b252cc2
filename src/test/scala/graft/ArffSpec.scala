package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Arff

class ArffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false").getOrCreate()

  def write(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("arff")
    val f = dir.resolve(name)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("univariate ARFF: values + trailing class label") {
    val p = write("uni.arff",
      """@relation test
        |@attribute t1 numeric
        |@attribute t2 numeric
        |@attribute t3 numeric
        |@attribute target {a,b}
        |@data
        |1.0,2.0,3.0,a
        |4.0,5.0,6.0,b
        |""".stripMargin)
    val df = Arff.load(spark, p).collect().sortBy(_.getLong(0))
    assert(df.length == 2)
    assert(df(0).getString(2) == "a" && df(1).getString(2) == "b")
    val ts0 = df(0).getSeq[scala.collection.Seq[Double]](1)
    assert(ts0.map(_.head) == Seq(1.0, 2.0, 3.0))
  }

  test("multivariate relational ARFF: channels transpose to ts(t)(dim)") {
    val p = write("mv.arff",
      "@relation test\n@attribute s relational\n@attribute target {x,y}\n@data\n" +
        "'1.0,2.0\\n10.0,20.0',x\n'3.0,4.0\\n30.0,40.0',y\n")
    val df = Arff.load(spark, p).collect().sortBy(_.getLong(0))
    assert(df.length == 2)
    assert(df(0).getString(2) == "x")
    val ts0 = df(0).getSeq[scala.collection.Seq[Double]](1)
    assert(ts0.map(_.toSeq) == Seq(Seq(1.0, 10.0), Seq(2.0, 20.0)))
  }
}
