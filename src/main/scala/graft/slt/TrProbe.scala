package graft.slt
object TrProbe {
  def main(args: Array[String]): Unit = {
    val sql = """create table regexp_test_data (str varchar, pattern varchar, start int, flags varchar) as values
    (NULL,        '^(a)', 1, 'i'),
    ('abc',       '^(a)', 1, 'i'),
    ('ABC',       '^(A).*', 1, 'i'),
    ('aBc',       '(b|d)', 1, 'i'),
    ('AbC',       '(B|D)', 2, null),
    ('aBC',       '^(b|c)', 3, null),
    ('4000',      '\b4([1-9]\d\d|\d[1-9]\d|\d\d[1-9])\b', 1, null),
    ('4010',      '\b4([1-9]\d\d|\d[1-9]\d|\d\d[1-9])\b', 2, null),
    ('Düsseldorf','[\p{Letter}-]+', 3, null),
    ('Москва',    '[\p{L}-]+', 4, null),
    ('Köln',      '[a-zA-Z]ö[a-zA-Z]{2}', 1, null),
    ('إسرائيل',   '^\p{Arabic}+$', 2, null)"""
    println(SltRunner.translate(sql))
  }
}
