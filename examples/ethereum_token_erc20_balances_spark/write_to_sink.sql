-- reference examples/ethereum_token_erc20_balances/write_to_sink.sql:1-2 —
-- the ordered commit (runs post-Sequencer)
insert into sink
select * from buffer_{{.START}}_{{.END}}
