-- reference examples/ethereum_decoded_traces/write_to_sink.sql:1-2 —
-- the ordered commit (runs post-Sequencer)
insert into sink
select * from buffer_{{.START}}_{{.END}}
