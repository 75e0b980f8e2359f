-- Ported from clientpositive/quote2.q: doubled-quote escapes and
-- mixed-quote literals.
SELECT 'abc' AS plain,
       'abc''def' AS escaped_quote,
       'ab'
       'x' IS NOT NULL AS adjacent_is_separate,
       LENGTH('it''s') AS len_q
FROM region LIMIT 1
