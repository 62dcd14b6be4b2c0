-- reference examples/ethereum_logs/start.sql:1-3
select max(block_number) + 1 as start
from sink
