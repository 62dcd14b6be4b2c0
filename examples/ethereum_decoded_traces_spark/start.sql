-- reference examples/ethereum_decoded_traces/start.sql
select max(block_number) + 1 as start
from sink
