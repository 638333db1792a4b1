package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the JVM-scoped scratch space (ADVICE r03: temp-parquet
  * intermediates must not accumulate in /tmp across bench/Verify passes). */
class ScratchSpec extends AnyFunSuite {

  test("dir is stable per name — repeated passes reuse one path") {
    val a = graft.util.Scratch.dir("spec_stable")
    val b = graft.util.Scratch.dir("spec_stable")
    assert(a == b)
    assert(Files.isDirectory(Paths.get(a).getParent))
  }

  test("unique never repeats, and all paths share the reaped root") {
    val a = graft.util.Scratch.unique("spec_u")
    val b = graft.util.Scratch.unique("spec_u")
    assert(a != b)
    // same per-JVM root: the shutdown hook that removes the root reaps both
    val root = Paths.get(a).getParent.getParent
    assert(Paths.get(b).getParent.getParent == root)
    assert(Paths.get(graft.util.Scratch.dir("spec_stable")).getParent.getParent == root)
    assert(root.getFileName.toString.startsWith("graft_scratch"))
  }

  test("deleteTree removes a populated tree and tolerates absence") {
    val p = Files.createTempDirectory("graft_scratch_spec")
    Files.createDirectories(p.resolve("a/b"))
    Files.write(p.resolve("a/b/f.txt"), "x".getBytes("UTF-8"))
    graft.util.Scratch.deleteTree(p)
    assert(!Files.exists(p))
    graft.util.Scratch.deleteTree(p) // idempotent on a missing path
  }
}
