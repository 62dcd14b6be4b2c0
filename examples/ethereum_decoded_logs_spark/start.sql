-- reference examples/ethereum_decoded_logs/start.sql
select max(block_number) + 1 as start
from sink
