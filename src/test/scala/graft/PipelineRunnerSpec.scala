package graft

/** The persisted end-to-end runner (graft.Pipeline): stage artifacts land
  * as parquet, a re-run SKIPS completed stages, and a run into a fresh
  * directory reproduces every table BYTE-IDENTICALLY (deterministic
  * single-file sorted writes) — the Snakefile-resume contract.
  */
class PipelineRunnerSpec extends SparkTestBase {

  private def partFile(dir: String): java.io.File = {
    val fs = new java.io.File(dir).listFiles()
    assert(fs != null, s"missing table dir $dir")
    val parts = fs.filter(f => f.getName.startsWith("part-") &&
      f.getName.endsWith(".parquet"))
    assert(parts.length == 1, s"expected 1 part file in $dir, got ${parts.length}")
    parts.head
  }

  test("pipeline runner: persists stages, resume skips, fresh rerun is byte-identical") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_pipe_a").toString
    val r1 = Pipeline.run(spark, sfDir, dirA)
    assert(r1.map(_.stage) ==
      Seq("02_reference_files", "03_link_datasets", "04_accuracy"))
    assert(r1.forall(!_.skipped), s"first run skipped a stage: $r1")
    val tableDirs = Pipeline.stages.flatMap { case (s, ts) =>
      ts.map { case (t, _) => s"$s/$t" }
    }
    tableDirs.foreach { td =>
      assert(new java.io.File(s"$dirA/$td/_SUCCESS").isFile, s"no _SUCCESS in $td")
      assert(partFile(s"$dirA/$td").length() > 0, s"empty artifact $td")
    }
    // Resume: a second run over the same directory must skip every stage
    // and leave the artifacts untouched (mtime + bytes).
    val before = tableDirs.map(td => td ->
      (partFile(s"$dirA/$td").lastModified(), partFile(s"$dirA/$td").length())).toMap
    val r2 = Pipeline.run(spark, sfDir, dirA)
    assert(r2.forall(_.skipped), s"resume re-ran a complete stage: $r2")
    tableDirs.foreach { td =>
      val f = partFile(s"$dirA/$td")
      assert((f.lastModified(), f.length()) == before(td), s"resume touched $td")
    }
    // Determinism: a fresh-directory run reproduces every artifact
    // byte-for-byte (single file, fully sorted rows).
    val dirB = java.nio.file.Files.createTempDirectory("graft_pipe_b").toString
    val r3 = Pipeline.run(spark, sfDir, dirB)
    assert(r3.forall(!_.skipped))
    tableDirs.foreach { td =>
      val a = java.nio.file.Files.readAllBytes(partFile(s"$dirA/$td").toPath)
      val b = java.nio.file.Files.readAllBytes(partFile(s"$dirB/$td").toPath)
      assert(java.util.Arrays.equals(a, b),
        s"$td bytes differ between runs (${a.length} vs ${b.length})")
    }
  }
}
