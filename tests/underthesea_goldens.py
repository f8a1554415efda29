"""Committed golden corpus for C18 sentence tokenization.

``underthesea`` cannot run in this environment, so these goldens are
hand-derived from its published sentence-splitting rules (the public
``underthesea`` repository's ``sent_tokenize`` pipeline: split at
sentence-final ``.!?…`` + whitespace; protect title abbreviations and
``v.v.``; split after a closing quote that follows sentence-final
punctuation).  The agreement test in ``test_functions_vi.py`` replays this
corpus against the rule-based fallback and reports/asserts the exact-match
agreement rate, so the tokenizer-swap risk is a measured number instead of
an unknown (VERDICT r1, "What's missing" #7).

Each entry: (input paragraph, expected sentence list).
"""

GOLDENS = [
    # plain multi-sentence declaratives
    ("Trời hôm nay đẹp. Chúng tôi đi dạo.", ["Trời hôm nay đẹp.", "Chúng tôi đi dạo."]),
    ("Cô ấy đến muộn. Mọi người đã về hết. Đèn đã tắt.",
     ["Cô ấy đến muộn.", "Mọi người đã về hết.", "Đèn đã tắt."]),
    # exclamation / question enders
    ("Đi nhanh lên! Muộn rồi đấy.", ["Đi nhanh lên!", "Muộn rồi đấy."]),
    ("Bạn khỏe không? Tôi khỏe.", ["Bạn khỏe không?", "Tôi khỏe."]),
    ("Thật tuyệt vời! Không thể tin được! Quá đẹp.",
     ["Thật tuyệt vời!", "Không thể tin được!", "Quá đẹp."]),
    # single sentence, no trailing punctuation
    ("Một câu không có dấu cuối", ["Một câu không có dấu cuối"]),
    # trailing sentence without final punctuation
    ("Câu một. Câu hai chưa xong", ["Câu một.", "Câu hai chưa xong"]),
    # title abbreviations must not split
    ("TS. Nguyễn Văn An phát biểu tại hội nghị. Mọi người vỗ tay.",
     ["TS. Nguyễn Văn An phát biểu tại hội nghị.", "Mọi người vỗ tay."]),
    ("GS. Trần Bình là chủ tọa. PGS. Lê Cường thư ký.",
     ["GS. Trần Bình là chủ tọa.", "PGS. Lê Cường thư ký."]),
    ("ThS. Phạm Dung trình bày báo cáo. Hội trường im lặng.",
     ["ThS. Phạm Dung trình bày báo cáo.", "Hội trường im lặng."]),
    ("BS. Hoa khám bệnh ở TP. Hồ Chí Minh. Bệnh nhân rất đông.",
     ["BS. Hoa khám bệnh ở TP. Hồ Chí Minh.", "Bệnh nhân rất đông."]),
    # compound academic title (no whitespace inside PGS.TS.)
    ("PGS.TS. Vũ Em chủ trì buổi họp. Cuộc họp kéo dài hai giờ.",
     ["PGS.TS. Vũ Em chủ trì buổi họp.", "Cuộc họp kéo dài hai giờ."]),
    # v.v. mid-sentence must not split
    ("Cần mua rau, thịt, cá v.v. trước khi về. Chợ sắp đóng cửa.",
     ["Cần mua rau, thịt, cá v.v. trước khi về.", "Chợ sắp đóng cửa."]),
    # decimals and thousand separators (no whitespace after the dot)
    ("Giá trị là 3.5 điểm. Tổng cộng 1.000.000 đồng.",
     ["Giá trị là 3.5 điểm.", "Tổng cộng 1.000.000 đồng."]),
    # ellipsis enders
    ("Anh ấy cứ đi mãi… Không ai biết về đâu.",
     ["Anh ấy cứ đi mãi…", "Không ai biết về đâu."]),
    ("Chờ đã... Tôi quên mất.", ["Chờ đã...", "Tôi quên mất."]),
    # lowercase continuation still splits (punctuation-driven, not casing)
    ("nó chạy đi. rồi quay lại.", ["nó chạy đi.", "rồi quay lại."]),
    # multiple spaces / newline between sentences
    ("Câu một.  Câu hai.", ["Câu một.", "Câu hai."]),
    ("Câu một.\nCâu hai.", ["Câu một.", "Câu hai."]),
    # quote-final sentence end: underthesea splits AFTER the closing quote —
    # the rule-based fallback keeps it joined (known, documented divergence)
    ('Anh hét: "Dừng lại!" Rồi anh bỏ đi.',
     ['Anh hét: "Dừng lại!"', "Rồi anh bỏ đi."]),
    # Tr. (trang/page) abbreviation
    ("Xem Tr. 15 của tài liệu. Phần sau quan trọng hơn.",
     ["Xem Tr. 15 của tài liệu.", "Phần sau quan trọng hơn."]),
]
