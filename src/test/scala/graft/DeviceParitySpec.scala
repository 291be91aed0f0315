package graft

import java.nio.file.Files

/** Runs the adversarial device-parity gate (see [[DeviceParity]]'s scaladoc)
  * inside `sbt test`, so the twin devices stay pinned outside the fixture
  * value domain on every run — not just on the round the gate was written.
  * The DuckDB replay side needs python3 + the duckdb module (present on the
  * driver host, where every gate runs); where they're missing the test is
  * CANCELED, never silently passed. */
class DeviceParitySpec extends SparkSuite {

  test("shared twin devices are bitwise-equal on adversarial inputs") {
    val py = new ProcessBuilder("python3", "-c", "import duckdb, pandas")
      .redirectErrorStream(true).start()
    assume(py.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) &&
      py.exitValue() == 0, "python3+duckdb unavailable — parity gate skipped")

    val outDir = Files.createTempDirectory("graft_devpar").toString
    DeviceParity.run(spark, outDir)
    val tool = java.nio.file.Paths.get(
      sys.props("user.dir"), "tools", "device_parity.py").toString
    val p = new ProcessBuilder("python3", tool, outDir)
      // check_oracle (imported by the tool) lives next to it
      .directory(new java.io.File(sys.props("user.dir"), "tools"))
      .redirectErrorStream(true).start()
    // watchdog BEFORE draining stdout: readAllBytes blocks to EOF, so a
    // wedged interpreter would otherwise hang the suite and the waitFor
    // timeout below would never run (r15 diff review #2)
    val killer = new Thread(() => {
      if (!p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS))
        p.destroyForcibly()
    })
    killer.setDaemon(true); killer.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    p.waitFor()
    assert(p.exitValue() == 0, s"device parity failed (or timed out):\n$out")
    assert(out.contains(", 0 fail =="), out)
  }
}
