package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.EvmFunctions._
import graft.pipeline.{DerivedPipelines, EthereumPipelines, PipelineRunner, SinkTable}
import graft.pipeline.PipelineRunner.{Batch, Config}
import Util._

/** EVM/blockchain operator surface exposed to the driver gate. RPC-fed
  * queries run against the deterministic fake chain (`fake://`), so every
  * run yields identical rows; results are rows-only-checked except the
  * hex codec which DuckDB can oracle.
  */
object EvmOps extends QueryPack {

  private val endpoint = "fake://chain?tip=20#fail-on-error=true&fail-on-null=true"
  private def batch021 = Batch(0, 0, 20)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hex quantity codec — oracle-able against DuckDB to_hex.
    "e51_hex_codec" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.HexExpressions._
      t(s, dir, "orders")
        .select($"o_orderkey",
          evmHexEncodeQuantityN($"o_orderkey").as("hex_q"),
          evmHexDecodeLongN(evmHexEncodeQuantityN($"o_orderkey")).as("roundtrip"))
        .orderBy($"o_orderkey")
    }),

    // keccak256 over table data (native codegen'd expression). DuckDB
    // has no keccak, so the gate is a pinned 50-row golden
    // (PinnedGoldens) over a deterministic key sample.
    "e52_keccak256" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.HexExpressions._
      t(s, dir, "part")
        .filter($"p_partkey" % 40 === 0)
        .select($"p_partkey",
          evmHexEncodeN(keccak256N($"p_name".cast("binary"))).as("name_hash"))
        .orderBy($"p_partkey")
    }),

    // blocks fetch+extract transform (no sink) over the fake chain.
    // U256 columns are emitted as exact decimal strings — DECIMAL output
    // is not canonicalized stably by the driver's hasher.
    "e53_blocks_transform" -> ((s, _) => {
      import graft.functions.HexExpressions.u256ToStringN
      EthereumPipelines.blocksTransform(s, batch021, endpoint)
        .select(col("number"), col("timestamp"), evmHexEncode(col("hash")).as("hash_hex"),
          col("gas_used"), u256ToStringN(col("base_fee_per_gas")).as("base_fee_per_gas"))
        .orderBy(col("number"))
    }),

    // logs fetch: double explode + broadcast header join.
    "e54_logs_transform" -> ((s, _) => {
      EthereumPipelines.logsTransform(s, batch021, endpoint)
        .select(col("block_number"), col("log_index"),
          evmHexEncode(col("address")).as("address_hex"),
          size(col("topics")).as("n_topics"))
        .orderBy(col("block_number"), col("log_index"))
    }),

    // transactions: the parallel zip-explode of txs with receipts,
    // including the Dencun + OP-stack conditional column families.
    "e55_transactions_transform" -> ((s, _) => {
      import graft.functions.HexExpressions.u256ToStringN
      EthereumPipelines.transactionsTransform(s, batch021, endpoint,
          enableDencun = true, enableOpStack = true)
        .select(col("block_number"), col("transaction_index"), col("gas"),
          col("cumulative_gas_used"), col("status"),
          u256ToStringN(col("value")).as("value"),
          col("blob_gas_used"), col("is_system_tx"), col("l1_gas_used"),
          u256ToStringN(col("deposit_nonce")).as("deposit_nonce"))
        .orderBy(col("block_number"), col("transaction_index"))
    }),

    // end-to-end micro-batch pipeline: fetch → ordered commit → dedup read.
    "e56_blocks_pipeline" -> ((s, _) => {
      val path = java.nio.file.Files.createTempDirectory("graft-q-blocks")
        .resolve("sink").toString
      val defn = EthereumPipelines.blocks(endpoint, path)
      PipelineRunner.run(s, defn, Config(maxBatchSize = 7, workers = 2))
      SinkTable(path, Seq("number"), Some("timestamp")).read(s)
        .select(col("number"), col("gas_used"), col("size"))
        .orderBy(col("number"))
    }),

    // config-driven pipeline: yaml + Spark-SQL templates, no compiled
    // pipeline code (reference `pipeline <url>` UX).
    "e61_config_pipeline" -> ((s, _) => {
      graft.functions.EvmFunctions.registerAll(s)
      graft.functions.HexExpressions.registerAll(s)
      val dir = {
        val local = new java.io.File("examples/ethereum_blocks_spark")
        if (local.isDirectory) local.getPath
        else "/root/repo/examples/ethereum_blocks_spark"
      }
      val path = java.nio.file.Files.createTempDirectory("graft-q-sqlpipe")
        .resolve("sink").toString
      graft.pipeline.SqlPipeline.run(s, dir,
        Map("RPC_ENDPOINT" -> "fake://chain?tip=20", "SINK_PATH" -> path),
        c => c.copy(maxBatchSize = 7, workers = 2))
      SinkTable(path, Seq("number"), Some("timestamp")).read(s)
        .select(col("number"), col("gas_used"), col("size"))
        .orderBy(col("number"))
    }),

    // config-driven DERIVED pipeline: upstream logs sink → decoded sink,
    // defined entirely as yaml + SQL templates (Source section).
    "e62_config_derived" -> ((s, _) => {
      graft.functions.EvmFunctions.registerAll(s)
      graft.functions.HexExpressions.registerAll(s)
      val logsPath = java.nio.file.Files.createTempDirectory("graft-q-dl-src")
        .resolve("sink").toString
      PipelineRunner.run(s, EthereumPipelines.logs(endpoint, logsPath),
        Config(maxBatchSize = 21))
      val dir = {
        val local = new java.io.File("examples/ethereum_decoded_logs_spark")
        if (local.isDirectory) local.getPath
        else "/root/repo/examples/ethereum_decoded_logs_spark"
      }
      val sinkPath = java.nio.file.Files.createTempDirectory("graft-q-dl-out")
        .resolve("sink").toString
      graft.pipeline.SqlPipeline.run(s, dir, Map(
        "SOURCE_PATH" -> logsPath,
        "SINK_PATH" -> sinkPath,
        "EVENT_SIGS" -> "'event Transfer(address indexed,address indexed,uint256)'"))
      SinkTable(sinkPath, Seq("address", "signature", "block_number", "log_index"))
        .read(s)
        .select(col("block_number"), col("log_index"), col("signature"),
          get_json_object(col("inputs"), "$.arg2").as("amount"))
        .orderBy(col("block_number"), col("log_index"))
    }),

    // ABI event decode against the dictionary (signature + inputs JSON).
    "e57_decoded_logs" -> ((s, _) => {
      val dict = DerivedPipelines.AbiDictionary.builtin
      val lookup = dict.lookupUdf(s)
      EthereumPipelines.logsTransform(s, batch021, endpoint)
        .withColumn("evt_json", evmDecodeEvent(col("topics"), col("data"),
          lookup(element_at(col("topics"), 1))))
        .filter(get_json_object(col("evt_json"), "$.error").isNull)
        .select(col("block_number"), col("log_index"),
          get_json_object(col("evt_json"), "$.value.signature").as("signature"),
          get_json_object(col("evt_json"), "$.value.inputs.arg2").as("amount"))
        .orderBy(col("block_number"), col("log_index"))
    }),

    // ABI call decode (selector match on trace input/output).
    "e58_decoded_traces" -> ((s, _) => {
      val dict = DerivedPipelines.AbiDictionary.builtin
      val lookup = dict.lookupUdf(s)
      EthereumPipelines.tracesTransform(s, batch021, endpoint)
        .filter(length(col("input")) >= 4)
        .withColumn("call_json", evmDecodeCall(col("input"), col("output"),
          lookup(substring(col("input"), 1, 4))))
        .filter(get_json_object(col("call_json"), "$.error").isNull)
        .select(col("block_number"), col("transaction_index"),
          evmHexEncode(col("transaction_from")).as("transaction_from"),
          col("transaction_status"),
          get_json_object(col("call_json"), "$.value.signature").as("signature"),
          get_json_object(col("call_json"), "$.value.outputs.arg0").as("success"))
        .orderBy(col("block_number"), col("transaction_index"))
    }),

    // VariantType open-schema decode: inputs as Spark 4 variant, fields
    // extracted with variant_get (no JSON re-parse) — rows-only.
    "e60_decoded_logs_variant" -> ((s, _) => {
      val logsPath = java.nio.file.Files.createTempDirectory("graft-q-vlogs")
        .resolve("sink").toString
      PipelineRunner.run(s, EthereumPipelines.logs(endpoint, logsPath),
        Config(maxBatchSize = 21))
      val source = SinkTable(logsPath, Seq("block_number", "log_index"))
      DerivedPipelines.decodedLogsVariantTransform(s, Batch(0, 0, 20), source,
          DerivedPipelines.AbiDictionary.builtin)
        .select(col("block_number"), col("log_index"), col("signature"),
          expr("variant_get(inputs, '$.arg2', 'string')").as("amount"),
          expr("variant_get(inputs, '$.arg0', 'string')").as("sender"))
        .orderBy(col("block_number"), col("log_index"))
    }),

    // dedup-then-RPC: erc20 balances over a fake-chain logs sink.
    "e59_erc20_balances" -> ((s, _) => {
      val logsPath = java.nio.file.Files.createTempDirectory("graft-q-logs")
        .resolve("sink").toString
      PipelineRunner.run(s, EthereumPipelines.logs(endpoint, logsPath),
        Config(maxBatchSize = 21))
      val source = SinkTable(logsPath, Seq("block_number", "log_index"))
      DerivedPipelines.erc20BalancesTransform(s, Batch(0, 0, 20), source, endpoint)
        .select(col("block_number"), evmHexEncode(col("wallet_address")).as("wallet_hex"),
          evmHexEncode(col("token_address")).as("token_hex"),
          col("token_symbol"), col("token_decimals").cast("int").as("token_decimals"),
          graft.functions.HexExpressions.u256ToStringN(col("raw_balance")).as("raw_balance"))
        .orderBy(col("block_number"), col("wallet_hex"), col("token_hex"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "e51_hex_codec" ->
      """SELECT o_orderkey, '0x' || lower(to_hex(o_orderkey)) AS hex_q,
        o_orderkey AS roundtrip
        FROM orders ORDER BY o_orderkey"""
  )
}
