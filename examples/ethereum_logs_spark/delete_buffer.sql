-- reference examples/ethereum_logs/delete_buffer.sql:1
drop temporary table buffer_{{.START}}_{{.END}}
