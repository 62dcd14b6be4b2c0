-- reference examples/ethereum_decoded_traces/delete_buffer.sql:1
drop temporary table buffer_{{.START}}_{{.END}}
