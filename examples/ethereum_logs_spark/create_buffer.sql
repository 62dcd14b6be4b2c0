-- Spark-dialect translation of examples/ethereum_logs/create_buffer.sql:
-- the chained ARRAY JOIN (receipts, then each receipt's logs) becomes two
-- LATERAL VIEW explodes; the header dep subquery is broadcast-joined back
-- on n (the reference's left join :96).
create temporary table buffer_{{.START}}_{{.END}} as (
    with block_numbers as (
        select id as n from range({{.START}}, {{.END}} + 1)
    ),

    deps as (
        select
            n,
            timestamp_seconds(evm_hex_decode_int_n(b.timestamp)) as timestamp,
            evm_hex_decode_n(b.hash) as block_hash,
            evm_hex_decode_int_n(b.number) as block_number
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
                ) as b
            from block_numbers
        )
    ),

    logs as (
        select
            n,
            evm_hex_decode_n(r.`from`) as transaction_from,
            cast(evm_hex_decode_int_n(r.status) as tinyint) as transaction_status,
            evm_hex_decode_n(r.transactionHash) as transaction_hash,
            cast(evm_hex_decode_int_n(r.transactionIndex) as int) as transaction_index,
            l.removed as removed,
            cast(evm_hex_decode_int_n(l.logIndex) as int) as log_index,
            evm_hex_decode_n(l.address) as address,
            evm_hex_decode_n(l.data) as data,
            transform(l.topics, x -> evm_hex_decode_n(x)) as topics
        from (
            select
                n,
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
                        transactionHash: STRING, transactionIndex: STRING,
                        logs: ARRAY<STRUCT<removed: BOOLEAN, logIndex: STRING,
                            address: STRING, data: STRING,
                            topics: ARRAY<STRING>>>>>'
                ) as receipts
            from block_numbers
        )
        lateral view explode(receipts) R as r
        lateral view explode(r.logs) L as l
    )

    select
        d.timestamp,
        d.block_hash,
        d.block_number,
        l.transaction_from,
        l.transaction_status,
        l.transaction_hash,
        l.transaction_index,
        l.removed,
        l.log_index,
        l.address,
        l.data,
        l.topics
    from logs as l
    left join deps as d on l.n = d.n
)
