package graft.queries

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Fixture provisioning must be once-only and safe under concurrency: the
  * completion marker is written only after a successful build, a partial
  * build (crash before marker) is wiped and rebuilt, and concurrent
  * provisioners all succeed with the build running exactly once. */
class ProvisioningSpec extends AnyFunSuite {

  test("concurrent provisioners: build runs once, all callers succeed") {
    val root = new File(Files.createTempDirectory("prov").toFile, "fixture")
    val builds = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => IcebergOps.provisionOnce(root) {
        builds.incrementAndGet()
        new File(root, "payload").mkdirs()
        Thread.sleep(50) // widen the race window
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get() == 1, s"build ran ${builds.get()} times")
    assert(new File(root, "payload").isDirectory)
    assert(new File(root, ".graft-complete").isFile)
  }

  test("a crashed partial build is wiped and rebuilt on the next call") {
    val root = new File(Files.createTempDirectory("prov2").toFile, "fixture")
    intercept[RuntimeException] {
      IcebergOps.provisionOnce(root) {
        new File(root, "partial").mkdirs()
        throw new RuntimeException("crash mid-build")
      }
    }
    assert(!new File(root, ".graft-complete").isFile)
    IcebergOps.provisionOnce(root) {
      assert(!new File(root, "partial").exists(), "partial state not wiped")
      new File(root, "good").mkdirs()
    }
    assert(new File(root, "good").isDirectory)
    assert(new File(root, ".graft-complete").isFile)
    // and a third call is a no-op (marker short-circuits)
    IcebergOps.provisionOnce(root) { fail("build re-ran after completion") }
  }
}
