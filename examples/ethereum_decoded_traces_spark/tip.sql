-- reference examples/ethereum_decoded_traces/tip.sql:1-3 — the derived
-- tip is the upstream sink's high-water mark
select max(block_number) as tip
from source
