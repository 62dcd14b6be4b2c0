-- Spark-dialect translation of
-- examples/ethereum_transactions/create_buffer.sql. The parallel zipped
-- ARRAY JOIN (`array join block.transactions as tx, receipts as r`,
-- reference :161) is arrays_zip + one explode — POSITIONAL, never a
-- cross product. UInt256 quantities land as canonical 32-byte binary
-- (evm_hex_decode_u256_n).
create temporary table buffer_{{.START}}_{{.END}} as (
    with block_numbers as (
        select id as n from range({{.START}}, {{.END}} + 1)
    ),

    rows as (
        select
            n,
            from_json(
                get_json_object(
                    ethereum_rpc(
                        'eth_getBlockByNumber',
                        array(evm_hex_encode_int_n(n), 'true'),
                        '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'
                    ),
                    '$.value'
                ),
                'timestamp STRING, transactions ARRAY<STRUCT<
                    accessList: ARRAY<STRUCT<address: STRING, storageKeys: ARRAY<STRING>>>,
                    blockHash: STRING, blockNumber: STRING, chainId: STRING,
                    `from`: STRING, gas: STRING, gasPrice: STRING, hash: STRING,
                    input: STRING, maxFeePerGas: STRING, maxPriorityFeePerGas: STRING,
                    nonce: STRING, r: STRING, s: STRING, to: STRING,
                    transactionIndex: STRING, type: STRING, v: STRING,
                    value: STRING, yParity: STRING
                    {{ if .ENABLE_DENCUN }},
                    maxFeePerBlobGas: STRING, blobVersionedHashes: ARRAY<STRING>
                    {{ end }}
                    {{ if .ENABLE_OP_STACK }},
                    sourceHash: STRING, mint: STRING, isSystemTx: STRING
                    {{ end }}
                >>'
            ) as block,
            from_json(
                get_json_object(
                    ethereum_rpc(
                        'eth_getBlockReceipts',
                        array(evm_hex_encode_int_n(n)),
                        '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'
                    ),
                    '$.value'
                ),
                'ARRAY<STRUCT<
                    contractAddress: STRING, cumulativeGasUsed: STRING,
                    effectiveGasPrice: STRING, gasUsed: STRING, root: STRING,
                    status: STRING
                    {{ if .ENABLE_DENCUN }},
                    blobGasUsed: STRING, blobGasPrice: STRING
                    {{ end }}
                    {{ if .ENABLE_OP_STACK }},
                    depositNonce: STRING, depositReceiptVersion: STRING,
                    l1GasPrice: STRING, l1GasUsed: STRING, l1Fee: STRING,
                    l1FeeScalar: STRING, l1BlobBaseFee: STRING,
                    l1BaseFeeScalar: STRING, l1BlobBaseFeeScalar: STRING
                    {{ end }}
                >>'
            ) as receipts
        from block_numbers
    ),

    zipped as (
        select
            timestamp_seconds(evm_hex_decode_int_n(block.timestamp)) as timestamp,
            explode(arrays_zip(tx, r)) as z
        from (select block, block.transactions as tx, receipts as r from rows)
    )

    select
        timestamp,
        transform(z.tx.accessList, a -> struct(
            evm_hex_decode_n(a.address) as address,
            transform(a.storageKeys, k -> evm_hex_decode_n(k)) as storage_keys
        )) as access_list,
        evm_hex_decode_n(z.tx.blockHash) as block_hash,
        evm_hex_decode_int_n(z.tx.blockNumber) as block_number,
        cast(evm_hex_decode_int_n(z.tx.chainId) as int) as chain_id,
        evm_hex_decode_n(z.tx.`from`) as `from`,
        evm_hex_decode_int_n(z.tx.gas) as gas,
        evm_hex_decode_u256_n(z.tx.gasPrice) as gas_price,
        evm_hex_decode_n(z.tx.hash) as hash,
        evm_hex_decode_n(z.tx.input) as input,
        evm_hex_decode_u256_n(z.tx.maxFeePerGas) as max_fee_per_gas,
        evm_hex_decode_u256_n(z.tx.maxPriorityFeePerGas) as max_priority_fee_per_gas,
        evm_hex_decode_u256_n(z.tx.nonce) as nonce,
        evm_hex_decode_n(z.tx.r) as r,
        evm_hex_decode_n(z.tx.s) as s,
        evm_hex_decode_n(z.tx.to) as to,
        cast(evm_hex_decode_int_n(z.tx.transactionIndex) as int) as transaction_index,
        cast(evm_hex_decode_int_n(z.tx.type) as smallint) as type,
        evm_hex_decode_n(z.tx.v) as v,
        evm_hex_decode_u256_n(z.tx.value) as value,
        cast(evm_hex_decode_int_n(z.tx.yParity) as tinyint) as y_parity,
        evm_hex_decode_n(z.r.contractAddress) as contract_address,
        evm_hex_decode_int_n(z.r.cumulativeGasUsed) as cumulative_gas_used,
        evm_hex_decode_u256_n(z.r.effectiveGasPrice) as effective_gas_price,
        evm_hex_decode_int_n(z.r.gasUsed) as gas_used,
        evm_hex_decode_n(z.r.root) as root,
        cast(evm_hex_decode_int_n(z.r.status) as tinyint) as status

        {{ if .ENABLE_DENCUN }},
        evm_hex_decode_u256_n(z.tx.maxFeePerBlobGas) as max_fee_per_blob_gas,
        transform(z.tx.blobVersionedHashes, x -> evm_hex_decode_n(x)) as blob_versioned_hashes,
        evm_hex_decode_int_n(z.r.blobGasUsed) as blob_gas_used,
        evm_hex_decode_u256_n(z.r.blobGasPrice) as blob_gas_price
        {{ end }}

        {{ if .ENABLE_OP_STACK }},
        evm_hex_decode_n(z.tx.sourceHash) as source_hash,
        evm_hex_decode_u256_n(z.tx.mint) as mint,
        cast(if(length(z.tx.isSystemTx) > 0, z.tx.isSystemTx, 'false') as boolean) as is_system_tx,
        evm_hex_decode_u256_n(z.r.depositNonce) as deposit_nonce,
        evm_hex_decode_int_n(z.r.depositReceiptVersion) as deposit_receipt_version,
        evm_hex_decode_u256_n(z.r.l1GasPrice) as l1_gas_price,
        evm_hex_decode_int_n(z.r.l1GasUsed) as l1_gas_used,
        evm_hex_decode_u256_n(z.r.l1Fee) as l1_fee,
        evm_hex_decode_int_n(z.r.l1FeeScalar) as l1_fee_scalar,
        evm_hex_decode_u256_n(z.r.l1BlobBaseFee) as l1_blob_base_fee,
        evm_hex_decode_int_n(z.r.l1BaseFeeScalar) as l1_base_fee_scalar,
        evm_hex_decode_int_n(z.r.l1BlobBaseFeeScalar) as l1_blob_base_fee_scalar
        {{ end }}
    from zipped
)
