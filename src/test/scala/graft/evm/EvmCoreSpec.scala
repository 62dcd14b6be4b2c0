package graft.evm

import org.scalatest.funsuite.AnyFunSuite

/** Unit vectors from FIXTURES.md §A4 (public Keccak/ABI test constants). */
class EvmCoreSpec extends AnyFunSuite {

  test("keccak256 empty string") {
    assert(Keccak256.hashHex("") ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("keccak256 Transfer event signature (ERC-20 topic0)") {
    assert(Keccak256.hashHex("Transfer(address,address,uint256)") ==
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }

  test("keccak256 long input (multi-block sponge)") {
    // 200 bytes > rate 136 → exercises the second permutation
    val out = Keccak256.hash(Array.fill[Byte](200)(0x61))
    assert(out.length == 32)
    // stability check vs an independently computed constant
    assert(Hex.encode(out) ==
      "0x96ea54061def936c4be90b518992fdc6f12f535068a256229aca54267b4d084d")
  }

  test("hex decode/encode round-trips") {
    assert(Hex.decodeLong("0x0") == 0L)
    assert(Hex.decodeLong("0x1b4") == 436L)
    assert(Hex.encodeQuantity(436L) == "0x1b4")
    assert(Hex.encodeQuantity(0L) == "0x0")
    assert(Hex.encode(Hex.decode("0xdeadbeef")) == "0xdeadbeef")
    assert(Hex.decode("0xfff").sameElements(Array[Byte](0x0f, 0xff.toByte)))
    assert(Hex.encode(Array.empty[Byte]) == "0x")
    assert(Hex.decodeQuantity("0xffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff") ==
      (BigInt(1) << 256) - 1)
  }

  test("signature parsing: canonical form and selector") {
    val s = Abi.parseFullSig("event Transfer(address indexed,address indexed,uint256)")
    assert(s.canonicalSignature == "Transfer(address,address,uint256)")
    assert(s.inputs.count(_.indexed) == 2)
    val f = Abi.parseFullSig("function balanceOf(address)(uint256)")
    assert(f.canonicalSignature == "balanceOf(address)")
    assert(Hex.encode(f.selector) == "0x70a08231")
    val named = Abi.parseFullSig("event Transfer(address indexed from, address indexed to, uint256 value)")
    assert(named.canonicalSignature == "Transfer(address,address,uint256)")
    assert(named.inputs.map(_.name) == Seq(Some("from"), Some("to"), Some("value")))
    // uint alias canonicalizes to uint256
    assert(Abi.parseFullSig("event E(uint)").canonicalSignature == "E(uint256)")
  }

  private val transferSig = "event Transfer(address indexed,address indexed,uint256)"
  private val addrA = Hex.decode("0x" + "aa" * 20)
  private val addrB = Hex.decode("0x" + "bb" * 20)
  private def topicOf(addr: Array[Byte]): Array[Byte] =
    Hex.decode("0x" + "00" * 12 + Hex.encode(addr).substring(2))

  test("decode ERC-20 Transfer event") {
    val topics = Seq(
      Keccak256.hash("Transfer(address,address,uint256)"),
      topicOf(addrA), topicOf(addrB))
    val data = Abi.encodeStatic(Abi.UIntType(256), Abi.NumV(BigInt("123456789012345678901234567890")))
    val json = Abi.decodeEvent(topics, data, Seq(transferSig))
    assert(json == ("{\"value\":{\"signature\":\"Transfer(address,address,uint256)\"," +
      "\"inputs\":{\"arg0\":\"0x" + "aa" * 20 + "\",\"arg1\":\"0x" + "bb" * 20 +
      "\",\"arg2\":123456789012345678901234567890}}}"))
  }

  test("decode event: named params use names as keys") {
    val topics = Seq(Keccak256.hash("Transfer(address,address,uint256)"),
      topicOf(addrA), topicOf(addrB))
    val data = Abi.encodeStatic(Abi.UIntType(256), Abi.NumV(BigInt(7)))
    val json = Abi.decodeEvent(topics, data,
      Seq("event Transfer(address indexed from, address indexed to, uint256 value)"))
    assert(json.contains("\"from\":\"0x"))
    assert(json.contains("\"value\":7"))
  }

  test("decode event: multi-candidate disambiguation picks the matching sig") {
    val topics = Seq(Keccak256.hash("Transfer(address,address,uint256)"),
      topicOf(addrA), topicOf(addrB))
    val data = Abi.encodeStatic(Abi.UIntType(256), Abi.NumV(BigInt(1)))
    val json = Abi.decodeEvent(topics, data, Seq(
      "event Approval(address indexed,address indexed,uint256)", // topic0 mismatch
      "event Transfer(address indexed,uint256)",                 // arity mismatch
      transferSig))
    assert(json.contains("\"signature\":\"Transfer(address,address,uint256)\""))
  }

  test("decode event: unknown selector → error JSON") {
    val topics = Seq(Keccak256.hash("Unknown(uint256)"))
    val json = Abi.decodeEvent(topics, Array.emptyByteArray, Seq(transferSig))
    assert(json.startsWith("{\"error\":"))
  }

  test("decode call: dynamic string output (symbol())") {
    val sig = "function symbol()(string)"
    val input = Abi.parseFullSig(sig).selector
    val output = Abi.encodeTuple(Seq(Abi.StringType), Seq(Abi.StrV("WETH")))
    val json = Abi.decodeCall(input, output, Seq(sig))
    assert(json == "{\"value\":{\"signature\":\"symbol()\",\"inputs\":{},\"outputs\":{\"arg0\":\"WETH\"}}}")
  }

  test("decode call: balanceOf(address) input + uint256 output") {
    val sig = "function balanceOf(address)(uint256)"
    val parsed = Abi.parseFullSig(sig)
    val input = parsed.selector ++
      Abi.encodeTuple(Seq(Abi.AddressType), Seq(Abi.BytesV(addrA)))
    val output = Abi.encodeStatic(Abi.UIntType(256), Abi.NumV(BigInt("99")))
    val json = Abi.decodeCall(input, output, Seq(sig))
    assert(json.contains("\"inputs\":{\"arg0\":\"0x" + "aa" * 20 + "\"}"))
    assert(json.contains("\"outputs\":{\"arg0\":99}"))
  }

  test("decode call: selector mismatch → error JSON") {
    val input = Hex.decode("0xdeadbeef")
    val json = Abi.decodeCall(input, Array.emptyByteArray, Seq("function symbol()(string)"))
    assert(json.startsWith("{\"error\":"))
  }

  test("abi round-trip: dynamic array of uint256") {
    val t = Abi.ArrayType(Abi.UIntType(256))
    val vals = Abi.ArrV(Seq(Abi.NumV(1), Abi.NumV(2), Abi.NumV(3)))
    val enc = Abi.encodeTuple(Seq(t), Seq(vals))
    val dec = Abi.decodeTuple(Seq(t), enc)
    assert(dec == Seq(vals))
  }

  test("abi round-trip: string + bytes + bool + fixed bytes") {
    val types = Seq(Abi.StringType, Abi.BytesType, Abi.BoolType, Abi.FixedBytesType(4))
    val vals = Seq(Abi.StrV("hello world"), Abi.BytesV(Hex.decode("0x0102030405")),
      Abi.BoolV(true), Abi.BytesV(Hex.decode("0xcafebabe")))
    val dec = Abi.decodeTuple(types, Abi.encodeTuple(types, vals))
    assert(Abi.valueToJson(Abi.ArrV(dec)) == Abi.valueToJson(Abi.ArrV(vals)))
  }

  test("abi round-trip: negative int256") {
    val t = Seq(Abi.IntType(256): Abi.AbiType)
    val v = Seq(Abi.NumV(BigInt(-42)): Abi.AbiValue)
    assert(Abi.decodeTuple(t, Abi.encodeTuple(t, v)) == v)
  }

  test("decode rejects truncated data with error, not crash") {
    val json = Abi.decodeEvent(
      Seq(Keccak256.hash("Transfer(address,address,uint256)"), topicOf(addrA), topicOf(addrB)),
      Array[Byte](1, 2, 3), // truncated data section
      Seq(transferSig))
    assert(json.startsWith("{\"error\":"))
  }
}
