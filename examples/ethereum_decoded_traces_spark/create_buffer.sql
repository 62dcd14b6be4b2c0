-- Spark-dialect translation of
-- examples/ethereum_decoded_traces/create_buffer.sql: range-filter the
-- upstream traces, decode each call (input selector = left(input, 4))
-- against the candidate signatures, keep successful decodes.
create temporary table buffer_{{.START}}_{{.END}} as (
    with q0 as (
        select
            timestamp,
            block_hash,
            block_number,
            transaction_from,
            transaction_status,
            transaction_hash,
            transaction_index,
            subtraces,
            trace_address,
            error,
            call_type,
            `from`,
            gas,
            to,
            value,
            gas_used,
            input,
            output
        from source
        where block_number between {{.START}} and {{.END}}
          and length(input) >= 4
    ),

    q1 as (
        select
            *,
            evm_decode_call(input, output, array({{.CALL_SIGS}})) as call_json
        from q0
    )

    select
        timestamp,
        block_hash,
        block_number,
        transaction_from,
        transaction_status,
        transaction_hash,
        transaction_index,
        subtraces,
        trace_address,
        error,
        call_type,
        `from`,
        gas,
        to,
        value,
        gas_used,
        get_json_object(call_json, '$.value.signature') as signature,
        get_json_object(call_json, '$.value.inputs') as inputs,
        get_json_object(call_json, '$.value.outputs') as outputs
    from q1
    where get_json_object(call_json, '$.error') is null
)
