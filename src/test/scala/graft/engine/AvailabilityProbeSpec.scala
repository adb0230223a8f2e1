package graft.engine

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.util.{Failure, Success, Try}

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** S10: the availability-probe precondition — pass, fail, recovery, and a
  * real HTTP probe (loopback JDK HttpServer) for 200 / non-200 / timeout.
  * No SparkSession needed: the gate is pure control flow.
  */
class AvailabilityProbeSpec extends AnyFunSuite with Matchers {

  test("succeeding probe runs the body exactly once") {
    val bodyRuns = new AtomicInteger(0)
    val out = Medallion.requireAvailable(() => Success(())) {
      bodyRuns.incrementAndGet(); "gold"
    }
    out shouldBe "gold"
    bodyRuns.get() shouldBe 1
  }

  test("failing probe exhausts attempts, never evaluates the body") {
    val probeCalls = new AtomicInteger(0)
    val bodyRuns = new AtomicInteger(0)
    val ex = intercept[Medallion.SourceUnavailable] {
      Medallion.requireAvailable(
        () => { probeCalls.incrementAndGet(); Failure(new RuntimeException("down")) },
        attempts = 3) { bodyRuns.incrementAndGet() }
    }
    probeCalls.get() shouldBe 3
    bodyRuns.get() shouldBe 0
    ex.getMessage should include("3 attempt(s)")
    ex.getCause.getMessage shouldBe "down"
  }

  test("probe that recovers on a later attempt lets the body run") {
    val probeCalls = new AtomicInteger(0)
    val out = Medallion.requireAvailable(
      () => if (probeCalls.incrementAndGet() < 3) Failure(new RuntimeException("warming"))
            else Success(()),
      attempts = 3) { 42 }
    out shouldBe 42
    probeCalls.get() shouldBe 3
  }

  test("probe that THROWS (instead of returning Failure) still gets retries") {
    val probeCalls = new AtomicInteger(0)
    val out = Medallion.requireAvailable(
      () => { if (probeCalls.incrementAndGet() < 2)
                throw new RuntimeException("threw, not Failure")
              Success(()) },
      attempts = 3) { "ran" }
    out shouldBe "ran"
    probeCalls.get() shouldBe 2
    // and an always-throwing probe exhausts into the typed failure
    val ex = intercept[Medallion.SourceUnavailable] {
      Medallion.requireAvailable(
        () => throw new RuntimeException("hard down"), attempts = 2) { () }
    }
    ex.getCause.getMessage shouldBe "hard down"
  }

  test("attempts < 1 is rejected") {
    intercept[IllegalArgumentException] {
      Medallion.requireAvailable(() => Success(()), attempts = 0) { () }
    }
  }

  private def withServer(status: Int, sleepMs: Long = 0)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/probe", ex => {
      if (sleepMs > 0) Thread.sleep(sleepMs)
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/probe")
    finally server.stop(0)
  }

  test("httpProbe: 200 -> available") {
    withServer(200) { url =>
      Medallion.httpProbe(url)() shouldBe Success(())
    }
  }

  test("httpProbe: 503 -> unavailable, and the gate refuses to run") {
    withServer(503) { url =>
      val r = Medallion.httpProbe(url)()
      r.isFailure shouldBe true
      r.asInstanceOf[Try[Unit]].failed.get.getMessage should include("503")
      intercept[Medallion.SourceUnavailable] {
        Medallion.requireAvailable(Medallion.httpProbe(url), attempts = 2) {
          fail("body must not run when the source is down")
        }
      }
    }
  }

  test("httpProbe: response slower than readTimeout -> unavailable") {
    withServer(200, sleepMs = 2000) { url =>
      val r = Medallion.httpProbe(url, readTimeoutMs = 150)()
      r.isFailure shouldBe true
    }
  }
}
