-- Spark-dialect translation of examples/ethereum_traces/create_buffer.sql:
-- trace_block ARRAY JOIN becomes LATERAL VIEW explode; the per-block
-- receipts stay an UNEXPLODED array so the final projection can do the
-- computed-index lookup `receipts[transaction_position + 1]` (reference
-- :136-139) — Spark's 0-based, null-safe get(receipts, transaction_index).
create temporary table buffer_{{.START}}_{{.END}} as (
    with block_numbers as (
        select id as n from range({{.START}}, {{.END}} + 1)
    ),

    deps as (
        select
            n,
            timestamp_seconds(evm_hex_decode_int_n(b.timestamp)) as timestamp,
            evm_hex_decode_n(b.hash) as block_hash,
            evm_hex_decode_int_n(b.number) as block_number,
            transform(rcpts, r -> struct(
                evm_hex_decode_n(r.`from`) as transaction_from,
                cast(evm_hex_decode_int_n(r.status) as tinyint) as transaction_status,
                evm_hex_decode_n(r.transactionHash) as transaction_hash,
                cast(evm_hex_decode_int_n(r.transactionIndex) as int) as transaction_index
            )) as receipts
        from (
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
                    'timestamp STRING, number STRING, hash STRING'
                ) as b,
                from_json(
                    get_json_object(
                        ethereum_rpc(
                            'eth_getBlockReceipts',
                            array(evm_hex_encode_int_n(n)),
                            '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'
                        ),
                        '$.value'
                    ),
                    'ARRAY<STRUCT<`from`: STRING, status: STRING,
                        transactionHash: STRING, transactionIndex: STRING>>'
                ) as rcpts
            from block_numbers
        )
    ),

    traces as (
        select
            n,
            cast(t.transactionPosition as int) as transaction_index,
            t.subtraces as subtraces,
            t.traceAddress as trace_address,
            t.type as type,
            t.error as error,
            t.action.callType as call_type,
            evm_hex_decode_n(t.action.`from`) as `from`,
            evm_hex_decode_int_n(t.action.gas) as gas,
            evm_hex_decode_n(t.action.input) as input,
            evm_hex_decode_n(t.action.to) as to,
            evm_hex_decode_u256_n(t.action.value) as value,
            evm_hex_decode_n(t.action.address) as address,
            evm_hex_decode_u256_n(t.action.balance) as balance,
            evm_hex_decode_n(t.action.refundAddress) as refund_address,
            evm_hex_decode_n(t.action.author) as author,
            t.action.rewardType as reward_type,
            evm_hex_decode_n(t.action.init) as init,
            evm_hex_decode_n(t.result.address) as result_address,
            evm_hex_decode_n(t.result.code) as result_code,
            evm_hex_decode_int_n(t.result.gasUsed) as gas_used,
            evm_hex_decode_n(t.result.output) as output
        from (
            select
                n,
                from_json(
                    get_json_object(
                        ethereum_rpc(
                            'trace_block',
                            array(evm_hex_encode_int_n(n)),
                            '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'
                        ),
                        '$.value'
                    ),
                    'ARRAY<STRUCT<
                        transactionPosition: BIGINT, transactionHash: STRING,
                        subtraces: INT, traceAddress: ARRAY<INT>,
                        type: STRING, error: STRING,
                        action: STRUCT<callType: STRING, `from`: STRING,
                            gas: STRING, input: STRING, to: STRING,
                            value: STRING, address: STRING, balance: STRING,
                            refundAddress: STRING, author: STRING,
                            rewardType: STRING, init: STRING>,
                        result: STRUCT<gasUsed: STRING, output: STRING,
                            address: STRING, code: STRING>>>'
                ) as ts
            from block_numbers
        )
        lateral view explode(ts) T as t
    )

    select
        d.timestamp,
        d.block_hash,
        d.block_number,
        get(d.receipts, t.transaction_index).transaction_from as transaction_from,
        get(d.receipts, t.transaction_index).transaction_status as transaction_status,
        get(d.receipts, t.transaction_index).transaction_hash as transaction_hash,
        t.transaction_index,
        t.subtraces,
        t.trace_address,
        t.type,
        t.error,
        t.call_type,
        t.`from`,
        t.gas,
        t.input,
        t.to,
        t.value,
        t.address,
        t.balance,
        t.refund_address,
        t.author,
        t.reward_type,
        t.init,
        t.result_address,
        t.result_code,
        t.gas_used,
        t.output
    from traces as t
    left join deps as d on t.n = d.n
)
