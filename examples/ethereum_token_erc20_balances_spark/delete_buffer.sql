-- reference examples/ethereum_token_erc20_balances/delete_buffer.sql:1
drop temporary table buffer_{{.START}}_{{.END}}
