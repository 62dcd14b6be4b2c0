package graft.evm

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `HttpTransport` retry semantics against a real (in-process) flaky
  * HTTP endpoint: 5xx and 429 retry with backoff and then succeed;
  * exhausted retries surface as a retryable RpcException that the
  * `#fail-on-retryable-error` fragment flag turns into a batch
  * failure (and otherwise degrades to the `{"error":…}` row
  * contract); request timeouts are retryable; 4xx and RPC-level
  * errors are not retried. */
class RpcRetrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress(0), 0)
  private def base = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Respond with `codes` in sequence per path, then 200+result. */
  private def flakyContext(path: String, codes: Int*): java.util.concurrent.atomic.AtomicInteger = {
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    server.createContext(path, { exchange =>
      val i = hits.getAndIncrement()
      if (i < codes.length) exchange.sendResponseHeaders(codes(i), -1)
      else {
        val body = """{"jsonrpc":"2.0","id":1,"result":"0x10"}"""
          .getBytes("UTF-8")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
      }
      exchange.close()
    })
    hits
  }

  override def beforeAll(): Unit = server.start()
  override def afterAll(): Unit = server.stop(0)

  private def transport(path: String, attempts: Int = 3) =
    new Rpc.HttpTransport(base + path,
      requestTimeout = java.time.Duration.ofSeconds(5),
      maxAttempts = attempts, backoffMs = 10L)

  test("5xx retries until success") {
    val hits = flakyContext("/fiveohthree", 503, 500)
    assert(transport("/fiveohthree").call("eth_blockNumber", Nil) == "\"0x10\"")
    assert(hits.get() == 3)
  }

  test("429 is retryable") {
    val hits = flakyContext("/toomany", 429)
    assert(transport("/toomany").call("eth_blockNumber", Nil) == "\"0x10\"")
    assert(hits.get() == 2)
  }

  test("exhausted retries throw retryable; 4xx does not retry") {
    val hits = flakyContext("/alwaysdown", 500, 500, 500, 500, 500)
    val e = intercept[Rpc.RpcException] {
      transport("/alwaysdown", attempts = 2).call("eth_blockNumber", Nil)
    }
    assert(e.retryable && hits.get() == 2)

    val hits4 = flakyContext("/badreq", 400)
    val e4 = intercept[Rpc.RpcException] {
      transport("/badreq").call("eth_blockNumber", Nil)
    }
    assert(!e4.retryable && hits4.get() == 1, "4xx must not be retried")
  }

  test("request timeout is retryable and honored") {
    server.createContext("/slow", { exchange =>
      Thread.sleep(2000)
      exchange.sendResponseHeaders(200, -1); exchange.close()
    })
    val t = new Rpc.HttpTransport(base + "/slow",
      requestTimeout = java.time.Duration.ofMillis(150),
      maxAttempts = 2, backoffMs = 10L)
    val t0 = System.nanoTime()
    val e = intercept[Rpc.RpcException] { t.call("eth_blockNumber", Nil) }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(e.retryable)
    assert(sec < 1.5, f"timeout must cut the wait, took $sec%.1fs")
  }

  test("fragment flags govern what an exhausted retryable error becomes") {
    // the pooled transportFor path builds the default (300s/3-attempt)
    // transport, so exercise the flag interplay through ethereumRpc
    // with pre-registered flaky transports instead of live sleeps
    flakyContext("/gate", 503, 503, 503, 503)
    Rpc.register(base + "/gate",
      transport("/gate", attempts = 2))
    // without the flag: degraded row, not an exception
    val degraded = Rpc.ethereumRpc("eth_blockNumber", Nil, base + "/gate")
    assert(degraded.startsWith("{\"error\":"), degraded)
    // with the flag: the batch fails (pipeline retrier takes over).
    // transports are pooled by the PRE-fragment url, so the same
    // registration serves any flag combination
    flakyContext("/gate2", 503, 503, 503, 503)
    Rpc.register(base + "/gate2", transport("/gate2", attempts = 2))
    intercept[Rpc.RpcException] {
      Rpc.ethereumRpc("eth_blockNumber", Nil,
        base + "/gate2#fail-on-retryable-error=true")
    }
  }

  test("rpc-level error in a 2xx response is not retried") {
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    server.createContext("/rpcerr", { exchange =>
      hits.incrementAndGet()
      val body =
        """{"jsonrpc":"2.0","id":1,"error":{"code":-32000,"message":"boom"}}"""
          .getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    val e = intercept[Rpc.RpcException] {
      transport("/rpcerr").call("eth_blockNumber", Nil)
    }
    assert(!e.retryable && hits.get() == 1)
  }
}
