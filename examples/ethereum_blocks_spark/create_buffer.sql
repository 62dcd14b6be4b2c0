-- Spark-dialect translation of examples/ethereum_blocks/create_buffer.sql:
-- generate_series -> range(); JSONExtract 'Tuple(...)' -> from_json with a
-- DDL schema; evm_hex_decode_int(x, 'UIntN') -> evm_hex_decode_int_n /
-- evm_hex_decode_u256_n (UInt256 -> canonical 32-byte binary); arrayMap -> transform.
create temporary table buffer_{{.START}}_{{.END}} as (
    with block_numbers as (
        select id as n from range({{.START}}, {{.END}} + 1)
    ),

    raw as (
        select
            n,
            from_json(
                get_json_object(
                    ethereum_rpc(
                        'eth_getBlockByNumber',
                        array(evm_hex_encode_int_n(n), 'false'),
                        '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'
                    ),
                    '$.value'
                ),
                'timestamp STRING, baseFeePerGas STRING, blobGasUsed STRING,
                 difficulty STRING, excessBlobGas STRING, extraData STRING,
                 gasLimit STRING, gasUsed STRING, hash STRING, miner STRING,
                 mixHash STRING, nonce STRING, number STRING,
                 parentBeaconBlockRoot STRING, parentHash STRING,
                 receiptsRoot STRING, sha3Uncles STRING, size STRING,
                 stateRoot STRING, totalDifficulty STRING,
                 transactionsRoot STRING, withdrawalsRoot STRING,
                 uncles ARRAY<STRING>'
            ) as b
        from block_numbers
    )

    select
        timestamp_seconds(evm_hex_decode_int_n(b.timestamp)) as timestamp,
        evm_hex_decode_u256_n(b.baseFeePerGas) as base_fee_per_gas,
        evm_hex_decode_int_n(b.blobGasUsed) as blob_gas_used,
        evm_hex_decode_u256_n(b.difficulty) as difficulty,
        evm_hex_decode_int_n(b.excessBlobGas) as excess_blob_gas,
        evm_hex_decode_n(b.extraData) as extra_data,
        evm_hex_decode_int_n(b.gasLimit) as gas_limit,
        evm_hex_decode_int_n(b.gasUsed) as gas_used,
        evm_hex_decode_n(b.hash) as hash,
        evm_hex_decode_n(b.miner) as miner,
        evm_hex_decode_n(b.mixHash) as mix_hash,
        evm_hex_decode_u256_n(b.nonce) as nonce,
        evm_hex_decode_int_n(b.number) as number,
        evm_hex_decode_n(b.parentBeaconBlockRoot) as parent_beacon_block_root,
        evm_hex_decode_n(b.parentHash) as parent_hash,
        evm_hex_decode_n(b.receiptsRoot) as receipts_root,
        evm_hex_decode_n(b.sha3Uncles) as sha3_uncles,
        evm_hex_decode_int_n(b.size) as size,
        evm_hex_decode_n(b.stateRoot) as state_root,
        evm_hex_decode_u256_n(b.totalDifficulty) as total_difficulty,
        evm_hex_decode_n(b.transactionsRoot) as transactions_root,
        transform(b.uncles, x -> evm_hex_decode_n(x)) as uncles,
        evm_hex_decode_n(b.withdrawalsRoot) as withdrawals_root
    from raw
)
