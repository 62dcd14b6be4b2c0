-- reference examples/decoded_logs_to_daily_parquet_file/tip.sql:1-3 — export up
-- to YESTERDAY relative to the newest source row (today may still grow)
-- coalesce: an EMPTY source yields tip -1 (no batches), not a crash
select coalesce(datediff(max(to_date(timestamp)), date'1970-01-01') - 1, -1) as tip
from source
