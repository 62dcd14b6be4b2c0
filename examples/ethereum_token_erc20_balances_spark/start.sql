-- reference examples/ethereum_token_erc20_balances/start.sql
select max(block_number) + 1 as start
from sink
