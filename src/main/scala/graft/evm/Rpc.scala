package graft.evm

/** JSON-RPC transport layer behind the `ethereum_rpc` /
  * `ethereum_rpc_call` functions (reference: executable UDFs from its
  * bundle; call shape at examples/ethereum_blocks/create_buffer.sql:40-44
  * and examples/ethereum_token_erc20_balances/create_buffer.sql:94-101).
  *
  * Endpoint grammar: `scheme://…#opt=…&opt=…` where the fragment opts are
  * the reference's `fail-on-error`, `fail-on-null`,
  * `fail-on-retryable-error`. Schemes:
  *  - `http(s)://` — real JSON-RPC over HTTP (pooled client per JVM)
  *  - `fake://chain?tip=N` — deterministic synthetic chain (tests/fixtures)
  *
  * Result contract: `{"value":<result>}` on success, `{"error":"…"}` on
  * RPC error (unless fail-on-error), `{"value":null}` on null result
  * (unless fail-on-null).
  */
object Rpc {

  trait Transport {
    /** Returns the JSON-RPC `result` rendered as JSON text, or throws
      * RpcException on transport/RPC error; null result → "null". */
    def call(method: String, params: List[Any]): String
  }

  final class RpcException(msg: String, val retryable: Boolean = false)
    extends RuntimeException(msg)

  case class Endpoint(url: String, failOnError: Boolean, failOnNull: Boolean,
      failOnRetryableError: Boolean)

  def parseEndpoint(raw: String): Endpoint = {
    val hash = raw.indexOf('#')
    val (url, frag) = if (hash < 0) (raw, "") else (raw.substring(0, hash), raw.substring(hash + 1))
    val opts = frag.split('&').filter(_.nonEmpty).map { kv =>
      val eq = kv.indexOf('=')
      if (eq < 0) kv -> "true" else kv.substring(0, eq) -> kv.substring(eq + 1)
    }.toMap
    def flag(k: String) = opts.get(k).exists(_.equalsIgnoreCase("true"))
    Endpoint(url, flag("fail-on-error"), flag("fail-on-null"), flag("fail-on-retryable-error"))
  }

  // one transport instance per endpoint URL per JVM (executor-local pool)
  private val transports = new java.util.concurrent.ConcurrentHashMap[String, Transport]()

  def transportFor(url: String): Transport =
    transports.computeIfAbsent(url, u =>
      if (u.startsWith("fake://")) FakeChain.fromUrl(u)
      else if (u.startsWith("http://") || u.startsWith("https://")) new HttpTransport(u)
      else throw new IllegalArgumentException(s"unsupported endpoint scheme: $u"))

  /** For tests: install a custom transport under an arbitrary URL. */
  def register(url: String, t: Transport): Unit = transports.put(url, t)

  /** The `ethereum_rpc(method, params, endpoint)` contract. Each params
    * element is a raw JSON fragment if it parses as JSON (`'false'`,
    * `'"latest"'`), else a plain string (`'0x4d2'`) — matching the
    * reference's mixed usage (tip.sql:4-8 vs create_buffer.sql:40-44). */
  def ethereumRpc(method: String, params: Seq[String], endpointRaw: String): String = {
    val ep = parseEndpoint(endpointRaw)
    val parsed = params.map { p =>
      if (Json.isValid(p)) Json.parse(p) else p
    }.toList
    try {
      val result = transportFor(ep.url).call(method, parsed)
      if (result == "null") {
        if (ep.failOnNull) throw new RpcException(s"$method returned null")
        "{\"value\":null}"
      } else "{\"value\":" + result + "}"
    } catch {
      case e: RpcException =>
        if (ep.failOnError || (e.retryable && ep.failOnRetryableError)) throw e
        "{\"error\":\"" + Abi.jsonEscape(e.getMessage) + "\"}"
    }
  }

  /** The `ethereum_rpc_call(contract, funcSig, argsJson, blockNumber,
    * endpoint)` contract: ABI-encode the call, `eth_call` it, decode the
    * outputs as `{"value":{"arg0":…}}`. blockNumber -1 → "latest". */
  def ethereumRpcCall(contract: String, funcSig: String, argsJson: String,
      blockNumber: Long, endpointRaw: String): String = {
    val ep = parseEndpoint(endpointRaw)
    try {
      val sig = Abi.parseFullSig(funcSig)
      val argVals: Seq[Abi.AbiValue] =
        if (argsJson == null || argsJson.trim.isEmpty) Nil
        else Json.parse(argsJson) match {
          case xs: List[_] => xs.zip(sig.inputs).map { case (x, p) => toAbiValue(x, p.tpe) }
          case other => throw new IllegalArgumentException(s"args must be a JSON array, got $other")
        }
      val data = sig.selector ++ Abi.encodeTuple(sig.inputs.map(_.tpe), argVals)
      val blockTag = if (blockNumber < 0) "latest" else Hex.encodeQuantity(blockNumber)
      val callObj = Map("to" -> contract, "data" -> Hex.encode(data))
      val result = transportFor(ep.url).call("eth_call", List(callObj, blockTag))
      if (result == "null") {
        if (ep.failOnNull) throw new RpcException(s"eth_call returned null")
        return "{\"value\":null}"
      }
      val outBytes = Json.parse(result) match {
        case s: String => Hex.decode(s)
        case other => throw new IllegalArgumentException(s"unexpected eth_call result: $other")
      }
      val outVals = Abi.decodeTuple(sig.outputs.map(_.tpe), outBytes)
      val inner = sig.outputs.zipWithIndex.zip(outVals).map { case ((p, i), v) =>
        "\"" + p.name.getOrElse(s"arg$i") + "\":" + Abi.valueToJson(v)
      }.mkString("{", ",", "}")
      "{\"value\":" + inner + "}"
    } catch {
      case e: RpcException =>
        if (ep.failOnError || (e.retryable && ep.failOnRetryableError)) throw e
        "{\"error\":\"" + Abi.jsonEscape(e.getMessage) + "\"}"
      case e: Exception =>
        "{\"error\":\"" + Abi.jsonEscape(String.valueOf(e.getMessage)) + "\"}"
    }
  }

  private def toAbiValue(x: Any, tpe: Abi.AbiType): Abi.AbiValue = (x, tpe) match {
    case (s: String, Abi.AddressType) => Abi.BytesV(Hex.decode(s))
    case (s: String, Abi.FixedBytesType(_) | Abi.BytesType) => Abi.BytesV(Hex.decode(s))
    case (s: String, Abi.StringType) => Abi.StrV(s)
    case (s: String, Abi.UIntType(_) | Abi.IntType(_)) =>
      if (s.startsWith("0x")) Abi.NumV(Hex.decodeQuantity(s)) else Abi.NumV(BigInt(s))
    case (n: BigDecimal, Abi.UIntType(_) | Abi.IntType(_)) => Abi.NumV(n.toBigInt)
    case (b: Boolean, Abi.BoolType) => Abi.BoolV(b)
    case (xs: List[_], Abi.ArrayType(e)) => Abi.ArrV(xs.map(toAbiValue(_, e)))
    case (xs: List[_], Abi.FixedArrayType(e, _)) => Abi.ArrV(xs.map(toAbiValue(_, e)))
    case _ => throw new IllegalArgumentException(s"cannot coerce $x to ${tpe.canonical}")
  }

  /** Real HTTP JSON-RPC transport (java.net.http, one client per JVM)
    * with bounded retry of RETRYABLE failures — 5xx, 429, and
    * transport timeouts/IO errors — under linear backoff. What escapes
    * after `maxAttempts` is then governed by the endpoint fragment
    * flags: `#fail-on-retryable-error` (reference:
    * examples/ethereum_token_erc20_balances/create_buffer.sql:46)
    * propagates it and fails the batch (so the pipeline retrier can
    * shrink and re-run); otherwise the row degrades to `{"error":…}`.
    * Plain RPC-level errors (an `error` member in a 2xx response) and
    * non-429 4xx are NOT retryable: re-sending an invalid request
    * cannot help. */
  final class HttpTransport(url: String,
      requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(300),
      maxAttempts: Int = 3,
      backoffMs: Long = 200L) extends Transport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    private val counter = new java.util.concurrent.atomic.AtomicLong()

    def call(method: String, params: List[Any]): String = {
      val body = Json.render(Map(
        "jsonrpc" -> "2.0", "id" -> counter.incrementAndGet(),
        "method" -> method, "params" -> params))
      var attempt = 1
      while (true) {
        try return callOnce(body)
        catch {
          case e: RpcException if e.retryable && attempt < maxAttempts =>
            Thread.sleep(backoffMs * attempt)
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def callOnce(body: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .timeout(requestTimeout)
        .build()
      val resp =
        try client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.net.http.HttpTimeoutException =>
            throw new RpcException(s"timeout: ${e.getMessage}", retryable = true)
          case e: java.io.IOException =>
            throw new RpcException(s"io: ${e.getMessage}", retryable = true)
        }
      val code = resp.statusCode()
      if (code / 100 != 2)
        throw new RpcException(s"HTTP $code",
          retryable = code >= 500 || code == 429)
      val doc = Json.parse(resp.body()).asInstanceOf[Map[String, Any]]
      doc.get("error") match {
        case Some(err: Map[_, _]) =>
          throw new RpcException(s"rpc error: ${Json.render(err)}")
        case _ =>
          doc.get("result") match {
            case Some(r) => Json.render(r)
            case None => "null"
          }
      }
    }
  }
}
