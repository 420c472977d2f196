package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Single-file delimited export (reference S6, `TyreStore Challenge
  * .py:32-47`): coalesce(1) → one part file → rename to the target path.
  *
  * The reference's extra Python `csv.reader` rewrite is a no-op reformat
  * (same delimiter in and out), so the engine skips it and renames the
  * part file directly. `coalesce(1)` is export-only by design: it caps
  * write parallelism at 1, which is exactly what a single-file report
  * wants and exactly what a 100 TB table must never do — bulk data leaves
  * through partitioned writes, reports through this.
  */
object Export {

  /** Write `df` as one delimited text file with header at `target`. */
  def asDelimitedFile(df: DataFrame, target: String, sep: String = "|"): Path = {
    val tmp = Files.createTempDirectory("graft-export").resolve("out")
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("sep", sep)
      .csv(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(sys.error(s"no part file written under $tmp"))
      finally listing.close()
    val dst = Paths.get(target)
    if (dst.getParent != null) Files.createDirectories(dst.getParent)
    Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
    dst
  }
}
