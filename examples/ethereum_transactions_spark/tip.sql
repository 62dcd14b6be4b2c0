-- reference examples/ethereum_transactions/tip.sql:1-14
select
    evm_hex_decode_int_n(
        get_json_object(
            ethereum_rpc(
                'eth_getBlockByNumber',
                array('"{{.LATEST_BLOCK_STATUS | default "latest"}}"', 'false'),
                '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'
            ),
            '$.value.number'
        )
    ) as tip
