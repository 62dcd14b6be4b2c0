-- Spark-dialect translation of
-- examples/ethereum_decoded_logs/create_buffer.sql: range-filter the
-- upstream logs, decode each log against the candidate event
-- signatures, keep successful decodes.
create temporary table buffer_{{.START}}_{{.END}} as (
    with src as (
        select *
        from source
        where block_number between {{.START}} and {{.END}}
          and size(topics) > 0
    ),

    dec as (
        select
            *,
            evm_decode_event(topics, data, array({{.EVENT_SIGS}})) as evt_json
        from src
    )

    select
        timestamp,
        block_hash,
        block_number,
        transaction_hash,
        log_index,
        address,
        get_json_object(evt_json, '$.value.signature') as signature,
        get_json_object(evt_json, '$.value.inputs') as inputs
    from dec
    where get_json_object(evt_json, '$.error') is null
)
