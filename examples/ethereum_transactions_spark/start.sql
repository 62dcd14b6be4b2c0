-- reference examples/ethereum_transactions/start.sql:1-3
select max(block_number) + 1 as start
from sink
