package graft.evm

import Abi._

/** Deterministic synthetic Ethereum chain — the file-free stub transport
  * behind `fake://chain?tip=N` endpoints. Every response is a pure
  * function of the block number, so pipelines driven by it are exactly
  * reproducible (the test strategy from SURVEY.md §5: the reference
  * ships no fixtures, so goldens are derived from a deterministic stub).
  *
  * Chain shape per block n: `n % 3` transactions; each tx carries one
  * ERC-20 Transfer log and one call trace; two rotating token contracts;
  * eth_call supports symbol()/decimals()/balanceOf(address).
  */
object FakeChain {

  def fromUrl(url: String): FakeChain = {
    val tip = "tip=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toLong).getOrElse(1000L)
    // block spacing in seconds (default mainnet-ish 12s); raise it (e.g.
    // blocktime=14400) to make a short chain span several DAYS, which the
    // daily-export pipelines need
    val bt = "blocktime=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toLong).getOrElse(12L)
    new FakeChain(tip, bt)
  }

  def addr(tag: String): Array[Byte] = Keccak256.hash(tag).take(20)
  def h32(tag: String): Array[Byte] = Keccak256.hash(tag)

  val transferTopic0: Array[Byte] = Keccak256.hash("Transfer(address,address,uint256)")

  def tokenAddress(i: Int): Array[Byte] = addr(s"token${i % 2}")
  def walletAddress(n: Long, i: Int, side: Int): Array[Byte] = addr(s"wallet${(n + i + side) % 7}")

  def nTx(n: Long): Int = (n % 3).toInt
  def timestampOf(n: Long): Long = 1700000000L + 12 * n
  def amountOf(n: Long, i: Int): BigInt = BigInt(n) * 1000 + i + 1

  /** tx value in wei. Blocks where n % 5 == 2 carry whale transfers
    * (> 1e20 wei — beyond DECIMAL(38,18)'s integer range), so any
    * lossy UInt256 representation overflows visibly in tests. */
  def valueOf(n: Long, i: Int): BigInt =
    if (n % 5 == 2) BigInt(10).pow(21) * (i + 1) + BigInt(n)
    else BigInt(n) * 1000000000L + i
}

final class FakeChain(tip: Long, blockTime: Long = 12L) extends Rpc.Transport {
  import FakeChain._

  private def ts(n: Long): Long = 1700000000L + blockTime * n

  def call(method: String, params: List[Any]): String = method match {
    case "eth_getBlockByNumber" =>
      val n = blockNumberOf(params.head)
      if (n > tip) "null"
      else Json.render(blockDoc(n, full = params.lift(1).contains(true)))
    case "eth_getBlockReceipts" =>
      val n = blockNumberOf(params.head)
      if (n > tip) "null" else Json.render(receiptsDoc(n))
    case "trace_block" =>
      val n = blockNumberOf(params.head)
      if (n > tip) "null" else Json.render(tracesDoc(n))
    case "eth_call" =>
      val callObj = params.head.asInstanceOf[Map[String, Any]]
      ethCall(callObj("to").toString, callObj("data").toString, params.lift(1))
    case other => throw new Rpc.RpcException(s"unsupported method: $other")
  }

  private def blockNumberOf(p: Any): Long = p match {
    case "latest" | "safe" | "finalized" => tip
    case s: String => Hex.decodeLong(s)
    case n: BigDecimal => n.toLong
    case other => throw new Rpc.RpcException(s"bad block parameter: $other")
  }

  private def q(v: Long): String = Hex.encodeQuantity(v)
  private def qb(v: BigInt): String = Hex.encodeQuantity(v)

  private def blockDoc(n: Long, full: Boolean): Map[String, Any] = {
    val base = Map[String, Any](
      "timestamp" -> q(ts(n)),
      "baseFeePerGas" -> q(1000000000L + n),
      "blobGasUsed" -> q(0L),
      "difficulty" -> q(0L),
      "excessBlobGas" -> q(0L),
      "extraData" -> Hex.encode(s"graft$n".getBytes),
      "gasLimit" -> q(30000000L),
      "gasUsed" -> q(21000L * nTx(n)),
      "hash" -> Hex.encode(h32(s"block$n")),
      "miner" -> Hex.encode(addr(s"miner${n % 5}")),
      "mixHash" -> Hex.encode(h32(s"mix$n")),
      "nonce" -> q(n),
      "number" -> q(n),
      "parentBeaconBlockRoot" -> Hex.encode(h32(s"beacon$n")),
      "parentHash" -> Hex.encode(h32(s"block${n - 1}")),
      "receiptsRoot" -> Hex.encode(h32(s"receipts$n")),
      "sha3Uncles" -> Hex.encode(h32("uncles")),
      "size" -> q(500L + 100L * nTx(n)),
      "stateRoot" -> Hex.encode(h32(s"state$n")),
      "totalDifficulty" -> qb(BigInt(n) * 1000),
      "transactionsRoot" -> Hex.encode(h32(s"txroot$n")),
      "uncles" -> (if (n % 5 == 0 && n > 0) List(Hex.encode(h32(s"uncle$n"))) else Nil),
      "withdrawalsRoot" -> Hex.encode(h32(s"wroot$n")))
    if (!full) base + ("transactions" -> (0 until nTx(n)).map(i => Hex.encode(h32(s"tx$n-$i"))).toList)
    else base + ("transactions" -> (0 until nTx(n)).map(i => txDoc(n, i)).toList)
  }

  private def txDoc(n: Long, i: Int): Map[String, Any] = Map[String, Any](
    "accessList" -> Nil,
    "blockHash" -> Hex.encode(h32(s"block$n")),
    "blockNumber" -> q(n),
    "chainId" -> q(1L),
    "from" -> Hex.encode(walletAddress(n, i, 0)),
    "gas" -> q(21000L),
    "gasPrice" -> q(2000000000L),
    "hash" -> Hex.encode(h32(s"tx$n-$i")),
    "input" -> transferInput(n, i),
    "maxFeePerGas" -> q(3000000000L),
    "maxPriorityFeePerGas" -> q(100000000L),
    "nonce" -> q(n + i),
    "r" -> Hex.encode(h32(s"r$n-$i")),
    "s" -> Hex.encode(h32(s"s$n-$i")),
    "to" -> Hex.encode(tokenAddress(i)),
    "transactionIndex" -> q(i.toLong),
    "type" -> q(2L),
    "v" -> q(1L),
    "value" -> qb(valueOf(n, i)),
    "yParity" -> q(1L),
    "maxFeePerBlobGas" -> q(1L),
    "blobVersionedHashes" -> Nil,
    "sourceHash" -> Hex.encode(h32(s"source$n-$i")),
    "mint" -> q(0L),
    "isSystemTx" -> false)

  /** ERC-20 transfer(address,uint256) calldata for tx (n, i). */
  private def transferInput(n: Long, i: Int): String = {
    val sig = Abi.parseFullSig("function transfer(address,uint256)(bool)")
    val data = sig.selector ++ Abi.encodeTuple(
      Seq(AddressType, UIntType(256)),
      Seq(BytesV(walletAddress(n, i, 1)), NumV(amountOf(n, i))))
    Hex.encode(data)
  }

  private def receiptsDoc(n: Long): List[Any] =
    (0 until nTx(n)).map { i =>
      Map[String, Any](
        "contractAddress" -> null,
        "cumulativeGasUsed" -> q(21000L * (i + 1)),
        "effectiveGasPrice" -> q(2000000000L),
        "from" -> Hex.encode(walletAddress(n, i, 0)),
        "gasUsed" -> q(21000L),
        "status" -> q(1L),
        "to" -> Hex.encode(tokenAddress(i)),
        "transactionHash" -> Hex.encode(h32(s"tx$n-$i")),
        "transactionIndex" -> q(i.toLong),
        "type" -> q(2L),
        "root" -> Hex.encode(h32(s"root$n-$i")),
        "blobGasUsed" -> q(0L),
        "blobGasPrice" -> q(1L),
        "depositNonce" -> q(n + i),
        "depositReceiptVersion" -> q(1L),
        "l1GasPrice" -> q(30000000L + n),
        "l1GasUsed" -> q(1600L + i),
        "l1Fee" -> qb(BigInt(48000000000L) + BigInt(n) * 100 + i),
        "l1FeeScalar" -> q(684000L),
        "l1BlobBaseFee" -> q(1L),
        "l1BaseFeeScalar" -> q(1368L),
        "l1BlobBaseFeeScalar" -> q(810949L),
        "logs" -> List(Map[String, Any](
          "removed" -> false,
          "logIndex" -> q(i.toLong),
          "address" -> Hex.encode(tokenAddress(i)),
          "data" -> Hex.encode(Abi.encodeStatic(UIntType(256), NumV(amountOf(n, i)))),
          "topics" -> List(
            Hex.encode(transferTopic0),
            Hex.encode(pad32Addr(walletAddress(n, i, 0))),
            Hex.encode(pad32Addr(walletAddress(n, i, 1)))))))
    }.toList

  private def pad32Addr(a: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    System.arraycopy(a, 0, out, 12, 20)
    out
  }

  def isCreateTrace(n: Long, i: Int): Boolean = (n + i) % 7 == 0

  private def tracesDoc(n: Long): List[Any] =
    (0 until nTx(n)).map { i =>
      val base = Map[String, Any](
        "transactionPosition" -> BigDecimal(i),
        "transactionHash" -> Hex.encode(h32(s"tx$n-$i")),
        "subtraces" -> BigDecimal(0),
        "traceAddress" -> Nil,
        "error" -> "")
      if (isCreateTrace(n, i))
        base ++ Map[String, Any](
          "type" -> "create",
          "action" -> Map[String, Any](
            "from" -> Hex.encode(walletAddress(n, i, 0)),
            "gas" -> q(53000L),
            "init" -> Hex.encode(h32(s"initcode$n-$i").take(8)),
            "value" -> q(0L)),
          "result" -> Map[String, Any](
            "address" -> Hex.encode(addr(s"created$n-$i")),
            "code" -> Hex.encode(h32(s"deployed$n-$i").take(8)),
            "gasUsed" -> q(50000L)))
      else
        base ++ Map[String, Any](
          "type" -> "call",
          "action" -> Map[String, Any](
            "callType" -> "call",
            "from" -> Hex.encode(walletAddress(n, i, 0)),
            "gas" -> q(21000L),
            "input" -> transferInput(n, i),
            "to" -> Hex.encode(tokenAddress(i)),
            "value" -> q(0L)),
          "result" -> Map[String, Any](
            "gasUsed" -> q(20000L),
            "output" -> Hex.encode(Abi.encodeStatic(BoolType, BoolV(true)))))
    }.toList

  /** symbol() / decimals() / balanceOf(address) on the two fake tokens. */
  private def ethCall(to: String, dataHex: String, blockTag: Option[Any]): String = {
    val data = Hex.decode(dataHex)
    val selector = data.take(4)
    def sel(s: String) = Abi.parseFullSig(s).selector.sameElements(selector)
    val tokenIdx = (0 until 2).find(i => Hex.encode(tokenAddress(i)) == to.toLowerCase)
      .getOrElse(throw new Rpc.RpcException(s"unknown contract $to"))
    if (sel("function symbol()(string)"))
      Json.render(Hex.encode(Abi.encodeTuple(Seq(StringType), Seq(StrV(s"TOK$tokenIdx")))))
    else if (sel("function decimals()(uint8)"))
      Json.render(Hex.encode(Abi.encodeStatic(UIntType(8), NumV(BigInt(6 + 12 * tokenIdx)))))
    else if (sel("function balanceOf(address)(uint256)")) {
      val wallet = Abi.decodeTuple(Seq(AddressType), data.drop(4)).head
        .asInstanceOf[BytesV].v
      val block = blockTag.map {
        case s: String if s == "latest" => tip
        case s: String => Hex.decodeLong(s)
        case n: BigDecimal => n.toLong
      }.getOrElse(tip)
      // deterministic balance: hash(token, wallet, block) mod 1e12
      val h = Keccak256.hash(s"bal$tokenIdx-${Hex.encode(wallet)}-$block")
      val bal = BigInt(1, h.take(8)) % BigInt(1000000000000L)
      Json.render(Hex.encode(Abi.encodeStatic(UIntType(256), NumV(bal))))
    } else throw new Rpc.RpcException(s"unsupported selector ${Hex.encode(selector)}")
  }
}
