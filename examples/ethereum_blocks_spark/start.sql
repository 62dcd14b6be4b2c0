-- reference examples/ethereum_blocks/start.sql:1-3
select max(number) + 1 as start
from sink
