package graft

import graft.streaming.StreamGate
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-placement policy of the streaming replay gate:
  * STAGED INPUT scales with the data and must land on the disk-backed JVM
  * temp dir — never on /dev/shm, whose RAM-backed tmpfs (typically capped
  * at half of RAM) a large scale factor could exhaust. CHECKPOINTS are
  * kilobytes fsync'd every micro-batch and DO go to tmpfs when available.
  * The oracle gate can't catch a regression here (results are identical
  * either way, until the machine runs out of memory). */
class StreamGateScratchSpec extends AnyFunSuite {

  test("staged input never lands on tmpfs, even when /dev/shm is writable") {
    val dir = StreamGate.scratchDir("stage", "placement-spec")
    try {
      assert(!dir.startsWith("/dev/shm"), dir)
      val tmp = System.getProperty("java.io.tmpdir")
      assert(dir.startsWith(tmp), s"$dir not under java.io.tmpdir=$tmp")
    } finally StreamGate.deleteRecursively(dir)
  }

  test("checkpoints go to tmpfs when writable (RAM-backed fsync)") {
    assume(new java.io.File("/dev/shm").canWrite)
    val dir = StreamGate.scratchDir("ckpt", "placement-spec")
    try assert(dir.startsWith("/dev/shm"), dir)
    finally StreamGate.deleteRecursively(dir)
  }
}
