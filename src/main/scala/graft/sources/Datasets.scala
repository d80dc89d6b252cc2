package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dataset-loading tier — semantics of `/root/reference/tslearn/datasets/`
  * (`cached.py:48-87`, `ucr_uea.py:211-309`, `ucr_uea.py:85-133`,
  * `datasets.py:16-76`) re-expressed for Spark:
  *
  *  - [[CachedDatasets]]: fixtures statically bundled with the library
  *    (parquet under `data/cached/<Name>/{train,test}.parquet`), the
  *    counterpart of the reference's npz files under `.cached_datasets`. The Trace
  *    dataset (UCR archive, Bagnall et al.,
  *    www.timeseriesclassification.com) ships as the default fixture.
  *  - [[UcrUea]]: UCR/UEA archive layout loader — `<dir>/<Name>/
  *    <Name>_TRAIN.txt` + `_TEST.txt` (whitespace floats, label in
  *    column 0), falling back to the ARFF pair like the reference; local
  *    zip extraction and the baseline-accuracy CSV parser. The network
  *    fetch step of the reference is intentionally NOT reproduced (this
  *    library runs in zero-egress clusters); callers hand a local zip or
  *    an already-extracted directory to the same cache layout.
  *
  * Output schema everywhere: (series_id LONG, label LONG, values
  * ARRAY<DOUBLE>) — the exploded-free nested form every graft estimator
  * consumes directly.
  */
object Datasets {

  /** Root of bundled fixtures; override with -Dgraft.data.dir. */
  def cachedRoot: String = sys.props.getOrElse("graft.data.dir", "data/cached")

  object CachedDatasets {
    /** Bundled dataset names — `cached.py:26-45`. */
    def listDatasets(root: String = cachedRoot): Seq[String] = {
      val d = new java.io.File(root)
      if (!d.isDirectory) Seq.empty
      else d.listFiles.filter(f => f.isDirectory &&
        new java.io.File(f, "train.parquet").exists).map(_.getName).toSeq.sorted
    }

    /** (train, test) DataFrames for a bundled dataset — `cached.py:48-87`.
      * Throws if the fixture is absent (the reference raises IOError). */
    def loadDataset(spark: SparkSession, name: String,
                    root: String = cachedRoot): (DataFrame, DataFrame) = {
      val base = s"$root/$name"
      require(new java.io.File(s"$base/train.parquet").exists,
        s"no cached dataset '$name' under $root")
      (spark.read.parquet(s"$base/train.parquet"),
        spark.read.parquet(s"$base/test.parquet"))
    }
  }

  object UcrUea {

    /** UCR TXT format: whitespace-separated floats, label = column 0
      * (`utils.py:691-714` `_load_txt_uea`). series_id is the 0-based file
      * row — zipWithIndex preserves text-file byte order. */
    def loadTxt(spark: SparkSession, path: String): DataFrame = {
      import spark.implicits._
      spark.read.textFile(path).rdd.zipWithIndex()
        .map { case (l, i) => (i, l.trim) }
        .filter(_._2.nonEmpty)
        .map { case (i, l) =>
          val toks = l.split("[\\s,]+").filter(_.nonEmpty)
          (i, toks.head.toDouble.toLong, toks.tail.map(_.toDouble))
        }.toDF("series_id", "label", "values")
    }

    private def txtPair(dir: String, name: String): (String, String) =
      (s"$dir/$name/${name}_TRAIN.txt", s"$dir/$name/${name}_TEST.txt")

    /** Load `<name>` from an archive directory in the reference's cache
      * layout: TXT preferred, ARFF fallback (`ucr_uea.py:280-302`). None
      * when neither pair exists (the reference warns + returns Nones). */
    def loadDataset(spark: SparkSession, dataDir: String,
                    name: String): Option[(DataFrame, DataFrame)] = {
      val (trainTxt, testTxt) = txtPair(dataDir, name)
      if (new java.io.File(trainTxt).exists && new java.io.File(testTxt).exists)
        Some((loadTxt(spark, trainTxt), loadTxt(spark, testTxt)))
      else {
        val trainArff = s"$dataDir/$name/${name}_TRAIN.arff"
        val testArff = s"$dataDir/$name/${name}_TEST.arff"
        if (new java.io.File(trainArff).exists && new java.io.File(testArff).exists) {
          def conv(p: String) = Arff.load(spark, p)
            .select(org.apache.spark.sql.functions.col("series_id"),
              org.apache.spark.sql.functions.col("label").cast("long"),
              org.apache.spark.sql.functions.expr("transform(ts, x -> x[0])").as("values"))
          Some((conv(trainArff), conv(testArff)))
        } else None
      }
    }

    /** Extract a LOCAL zip into the cache layout (`datasets.py:16-53`
      * minus the urlretrieve — zero-egress environments provide the file).
      * Returns the target dir, or None on a corrupt zip (as the reference
      * warns-and-returns-None). */
    def extractZip(localZip: String, targetDir: String): Option[String] = {
      val target = Paths.get(targetDir)
      Files.createDirectories(target)
      val zf = try new java.util.zip.ZipFile(localZip) catch {
        case _: java.io.IOException => return None
      }
      try {
        val es = zf.entries()
        while (es.hasMoreElements) {
          val e = es.nextElement()
          val out = target.resolve(e.getName).normalize()
          require(out.startsWith(target.normalize()), s"zip-slip entry ${e.getName}")
          if (e.isDirectory) Files.createDirectories(out)
          else {
            Files.createDirectories(out.getParent)
            val in = zf.getInputStream(e)
            try Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
            finally in.close()
          }
        }
        Some(targetDir)
      } catch {
        case _: Exception => None
      } finally zf.close()
    }

    /** In-place text replacement (`datasets.py:56-76` — used by the
      * reference to fix typos in the downloaded baselines CSV). */
    def inFileStringReplace(path: String, oldString: String, newString: String): Unit = {
      val p = Paths.get(path)
      Files.writeString(p, Files.readString(p).replace(oldString, newString))
    }

    /** Baseline accuracies from a UEA/UCR `singleTrainTest.csv`-format
      * file — `ucr_uea.py:85-133`. First column (unnamed) = dataset name;
      * remaining columns = method accuracies; blank cells are skipped. */
    def baselineAccuracy(csvPath: String,
                         listDatasets: Seq[String] = null,
                         listMethods: Seq[String] = null): Map[String, Map[String, Double]] = {
      val lines = Files.readAllLines(Paths.get(csvPath))
      if (lines.isEmpty) return Map.empty
      val methods = lines.get(0).split(",", -1).map(_.trim)
      (1 until lines.size).flatMap { i =>
        val cells = lines.get(i).split(",", -1).map(_.trim)
        val name = cells(0)
        if (listDatasets != null && !listDatasets.contains(name)) None
        else Some(name -> methods.indices.drop(1).flatMap { j =>
          val m = methods(j)
          if (listMethods != null && !listMethods.contains(m)) None
          else if (j >= cells.length || cells(j).isEmpty) None
          else scala.util.Try(m -> cells(j).toDouble).toOption
        }.toMap)
      }.toMap
    }
  }
}
