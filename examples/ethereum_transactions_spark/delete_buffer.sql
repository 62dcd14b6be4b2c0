-- reference examples/ethereum_transactions/delete_buffer.sql:1
drop temporary table buffer_{{.START}}_{{.END}}
