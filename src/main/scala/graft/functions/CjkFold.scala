package graft.functions

/** CJK → ASCII transliteration tables backing [[AsciiFold]] (the last
  * `unidecode` coverage gap from reference `embeddings-pipeline.py:63-72`).
  *
  * Four independent mechanisms, cheapest-derivation-first:
  *
  *  - '''Hangul syllables''' (U+AC00–U+D7A3): fully algorithmic — decompose
  *    the syllable index into (choseong, jungseong, jongseong) jamo and map
  *    each through the standard jamo transliteration (`한국` → `hangug`,
  *    the letter-for-letter convention `unidecode` also uses, not the
  *    sound-change Revised-Romanization variant).
  *  - '''Kana''' (U+3041–U+30FF): derived from the JDK's Unicode character
  *    names — "HIRAGANA LETTER KA" → `ka` — with a small Hepburn exception
  *    table for the syllables Unicode names in Nihon-shiki (SI→shi, TU→tsu,
  *    …). Small kana romanize like their full forms (per-codepoint
  *    transliteration is context-free by design, like `unidecode`).
  *  - '''Fullwidth forms''' (U+FF01–U+FF5E, U+3000): algorithmic offset to
  *    their ASCII originals.
  *  - '''CJK Unified Ideographs''': a bounded hand-written table of the
  *    most frequent simplified-Chinese characters mapped to toneless
  *    pinyin; emitted lowercase with a trailing space so adjacent
  *    syllables stay word-separated (`中国` → `zhong guo `) — a
  *    romanization-convention choice, documented in SURVEY §7.4.1.
  *    Beyond the hand tiers, an ICU Han-Latin tail tier (round 15)
  *    derives readings for the rest of the basic block + extension A
  *    from the classpath icu4j; characters neither tier maps stay
  *    unmapped and are dropped by [[AsciiFold.fold]], like
  *    `unidecode`'s unmappable codepoints — observably, via the
  *    cjk_unmapped stat.
  */
object CjkFold {

  // --- Hangul (algorithmic) -------------------------------------------
  private val choseong = Array(
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "", "j",
    "jj", "ch", "k", "t", "p", "h")
  private val jungseong = Array(
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae", "oe",
    "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i")
  private val jongseong = Array(
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb", "ls",
    "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch", "k", "t",
    "p", "h")

  private def hangul(ch: Char): String = {
    val s = ch - 0xAC00
    choseong(s / 588) + jungseong(s % 588 / 28) + jongseong(s % 28)
  }

  // --- Kana (name-derived, Hepburn exceptions) ------------------------
  private val hepburn = Map(
    "SI" -> "shi", "TI" -> "chi", "TU" -> "tsu", "HU" -> "fu",
    "ZI" -> "ji", "DI" -> "ji", "DU" -> "zu")

  private val kana: Map[Char, String] = {
    val pat = "(HIRAGANA|KATAKANA) LETTER (SMALL )?([A-Z]+)".r
    (0x3041 to 0x30FF).flatMap { cp =>
      Option(Character.getName(cp)).collect {
        case pat(_, _, token) =>
          cp.toChar -> hepburn.getOrElse(token,
            token.toLowerCase(java.util.Locale.ROOT))
      }
    }.toMap
  }

  // --- CJK punctuation (small manual table) ---------------------------
  private val punct = Map(
    '。' -> ". ", '、' -> ", ", '・' -> " ", '「' -> "\"", '」' -> "\"",
    '『' -> "\"", '』' -> "\"", '《' -> "\"", '》' -> "\"", '〈' -> "\"",
    '〉' -> "\"", '〔' -> "(", '〕' -> ")", '【' -> "(", '】' -> ")")

  // --- CJK Unified Ideographs → toneless pinyin -----------------------
  // Grouped `pinyin:characters`; most common reading wins for polyphones
  // (的→de, 了→le, 行→xing, 长→chang, …). Bounded by construction; the
  // builder rejects a character accidentally listed under two syllables.
  private val pinyinGroups = Seq(
    "a:啊阿", "ai:爱艾碍癌哀挨矮唉", "an:安按案暗岸俺", "ang:昂", "ao:奥澳傲熬",
    "ba:八把爸吧拔罢霸巴", "bai:白百摆败拜柏", "ban:半办班般板版搬伴扮拌",
    "bang:帮棒邦榜膀", "bao:包报保抱宝暴薄爆胞堡", "bei:北被备背杯悲碑倍贝辈",
    "ben:本奔笨", "beng:崩", "bi:比必笔币避闭鼻彼逼壁臂毕碧蔽弊",
    "bian:边变便编遍辩辨", "biao:表标彪", "bie:别", "bin:宾滨",
    "bing:并病兵冰饼丙", "bo:波播博伯脖泊驳玻菠", "bu:不部布步补捕卜",
    "ca:擦", "cai:才采菜财材彩裁猜踩", "can:参残餐惨灿蚕", "cang:藏仓苍舱",
    "cao:草操曹槽", "ce:测册策侧厕", "ceng:层曾", "cha:查茶差插叉察",
    "chai:拆柴", "chan:产缠铲颤", "chang:长常场厂唱尝偿昌肠畅",
    "chao:超朝潮炒吵抄", "che:车彻撤扯", "chen:陈沉晨尘衬臣辰",
    "cheng:成城程称承诚乘撑呈惩秤", "chi:吃持迟池赤尺翅斥耻驰",
    "chong:充冲虫崇", "chou:抽愁丑臭筹酬仇绸", "chu:出处除初楚触储厨础畜",
    "chuan:传船穿川串喘", "chuang:创窗床闯", "chui:吹垂锤炊", "chun:春纯唇蠢",
    "ci:次此词磁雌辞慈刺", "cong:从匆聪葱", "cu:粗促醋", "cui:催脆翠摧",
    "cun:存村寸", "cuo:错措搓",
    "da:大打达答搭", "dai:带代待戴袋贷呆逮", "dan:但单担蛋弹淡旦胆诞",
    "dang:当党挡档荡", "dao:到道导倒刀岛盗稻祷", "de:的得德",
    "deng:等登灯邓凳瞪", "di:地第低底敌抵滴弟帝递蒂笛缔",
    "dian:点电店典淀殿垫颠", "diao:调掉钓吊雕", "die:跌爹叠蝶",
    "ding:定订顶丁盯钉锭", "diu:丢", "dong:动东懂冬洞冻栋董",
    "dou:都斗豆逗兜陡", "du:度读独毒渡肚杜堵赌睹", "duan:段断短端锻",
    "dui:对队堆兑", "dun:吨顿蹲盾炖", "duo:多夺朵躲堕舵",
    "e:饿恶额俄鹅蛾", "en:恩", "er:而二儿耳尔饵",
    "fa:发法罚乏伐阀", "fan:反饭范凡翻烦繁返泛犯帆番贩",
    "fang:方放房防访仿纺芳妨", "fei:非飞费肥废肺匪诽",
    "fen:分份粉奋愤纷坟焚", "feng:风封丰蜂峰锋疯缝凤讽奉", "fo:佛", "fou:否",
    "fu:夫服福副复府父负富妇付扶符附腐赴浮覆辅抚腹肤幅伏俯斧赋",
    "ga:尬", "gai:该改盖概钙", "gan:干感敢赶甘肝杆柑竿",
    "gang:刚钢港岗纲缸", "gao:高告搞稿糕膏", "ge:个各格歌哥割阁隔革葛胳鸽搁",
    "gei:给", "gen:根跟", "geng:更耕颈梗", "gong:工公共功攻供宫贡恭巩躬",
    "gou:够构狗购沟勾钩", "gu:古故顾股骨谷鼓孤姑估固雇辜菇",
    "gua:挂刮瓜寡卦", "guai:怪乖拐", "guan:关管观官馆惯冠灌罐贯",
    "guang:光广逛", "gui:规贵归鬼桂柜轨跪龟", "gun:滚棍", "guo:国过果锅郭裹",
    "ha:哈", "hai:还海害孩亥骇", "han:汉含寒喊汗韩旱憾罕捍焊", "hang:航杭",
    "hao:好号毫豪耗浩", "he:和合河何核喝贺呵荷禾盒赫褐", "hei:黑嘿",
    "hen:很恨狠痕", "heng:横恒衡哼", "hong:红宏洪轰虹鸿哄",
    "hou:后候厚侯喉吼猴", "hu:护湖户呼胡虎壶互糊弧忽狐蝴",
    "hua:话化华花划画滑猾", "huai:坏怀淮徊", "huan:欢换环缓幻唤患宦涣焕",
    "huang:黄皇荒慌煌晃谎凰", "hui:会回汇挥辉灰毁悔恢慧绘惠晦贿",
    "hun:婚混魂浑昏荤", "huo:或活火货获伙惑霍祸豁",
    "ji:机几及即级极计记济急集己纪基技际剂季既激寄绩迹饥辑籍吉挤脊圾冀妓忌悸祭击",
    "jia:家加价假架甲佳嘉夹驾嫁稼颊",
    "jian:见间件建简坚检减剑肩渐监兼歼艰奸捡柬碱拣荐贱键箭舰",
    "jiang:将讲江奖降疆姜浆僵匠酱蒋",
    "jiao:教交叫较角脚焦骄郊浇娇搅缴绞狡胶椒饺",
    "jie:接解界结节街姐介借戒届皆捷截劫洁杰竭",
    "jin:进近金今仅紧尽斤禁津筋晋锦",
    "jing:经京精境警竞静惊景敬镜径井睛晶兢净", "jiong:窘",
    "jiu:就九久酒旧救究纠揪舅灸",
    "ju:局据具举句巨聚拒剧居距俱菊鞠拘矩惧驹锯", "juan:卷捐娟倦绢",
    "jue:决觉绝爵嚼掘", "jun:军均君俊菌峻竣骏",
    "ka:卡咖", "kai:开凯慨", "kan:看刊砍堪坎", "kang:抗康慷扛炕",
    "kao:考靠烤拷", "ke:可科克课刻客颗棵柯渴壳咳苛", "ken:肯恳啃垦",
    "keng:坑", "kong:空控孔恐", "kou:口扣寇", "ku:苦哭库裤枯窟酷",
    "kua:夸跨垮挎", "kuai:快块筷", "kuan:宽款", "kuang:况矿狂框旷眶筐",
    "kui:亏愧奎馈窥", "kun:困昆捆", "kuo:扩括阔廓",
    "la:拉啦辣蜡腊喇", "lai:来赖莱", "lan:蓝篮栏烂懒览滥拦揽缆",
    "lang:浪朗郎狼廊", "lao:老劳牢捞姥烙", "le:了乐勒",
    "lei:类累雷泪垒磊蕾", "leng:冷愣",
    "li:里理力利立李历例离礼丽励黎厉璃莉厘栗砾吏沥", "lia:俩",
    "lian:连联脸练恋炼廉莲镰怜帘", "liang:两量亮辆粮梁良凉谅晾",
    "liao:料疗辽聊僚廖撩", "lie:列烈裂猎劣", "lin:林临邻磷鳞凛赁淋",
    "ling:领令另零灵铃陵岭龄凌玲", "liu:六流留刘柳溜瘤硫榴",
    "long:龙隆笼聋垄拢", "lou:楼漏陋搂篓",
    "lu:路陆录卢炉鲁露庐芦颅碌鹿禄赂", "luan:乱卵", "lun:论轮伦仑沦",
    "luo:落罗络逻裸骆萝螺洛", "lv:绿律旅虑履屡侣驴铝滤",
    "ma:马吗妈码麻骂嘛玛", "mai:买卖麦埋迈脉", "man:满慢漫蛮瞒蔓馒",
    "mang:忙盲茫莽", "mao:毛猫矛冒贸帽貌茂锚", "me:么",
    "mei:没每美妹煤梅媒眉魅霉枚玫酶", "men:们门闷", "meng:梦猛蒙盟萌孟",
    "mi:米密秘迷蜜谜觅眯弥", "mian:面免棉眠绵勉缅", "miao:苗秒妙描庙瞄",
    "mie:灭蔑", "min:民敏悯闽", "ming:明名命鸣铭", "miu:谬",
    "mo:模磨摩魔末莫墨默漠陌膜摸抹", "mou:某谋牟",
    "mu:目木母亩幕墓慕牧穆姆募",
    "na:那拿哪纳娜钠", "nai:乃奶耐奈", "nan:南难男", "nang:囊",
    "nao:脑闹恼挠", "ne:呢", "nei:内馁", "nen:嫩", "neng:能",
    "ni:你尼泥妮逆溺拟腻", "nian:年念捻撵碾粘", "niang:娘酿", "niao:鸟尿",
    "nie:捏聂孽", "nin:您", "ning:宁凝拧柠", "niu:牛扭纽钮",
    "nong:农浓弄", "nu:努怒奴", "nuan:暖", "nuo:诺挪懦",
    "o:哦", "ou:欧偶呕殴鸥",
    "pa:怕爬帕趴", "pai:派拍排牌徘", "pan:盘判盼叛畔攀", "pang:旁庞胖乓",
    "pao:跑炮泡抛袍", "pei:配陪培赔佩裴", "pen:喷盆",
    "peng:朋碰棚蓬膨鹏捧烹", "pi:皮批匹披疲脾僻劈啤屁譬",
    "pian:片篇骗偏翩", "piao:票漂飘瓢", "pie:撇瞥", "pin:品贫聘拼频",
    "ping:平评瓶凭萍乒屏", "po:破迫婆坡泼颇魄", "pou:剖",
    "pu:普扑铺仆朴葡蒲谱曝瀑",
    "qi:起其七气期齐器汽奇企启妻棋旗弃契歧祈漆戚欺骑岂", "qia:恰洽掐",
    "qian:前千钱签浅潜迁欠牵谦乾铅谴嵌", "qiang:强枪墙抢腔",
    "qiao:桥巧敲悄瞧乔侨翘俏窍", "qie:切且窃怯", "qin:亲琴侵勤秦擒禽寝",
    "qing:请青清情轻庆倾晴氢顷卿", "qiong:穷琼", "qiu:求球秋丘邱囚",
    "qu:去取区曲趣屈趋驱渠娶躯", "quan:全权圈劝泉拳犬券",
    "que:却确缺雀鹊", "qun:群裙",
    "ran:然染燃冉", "rang:让嚷壤", "rao:绕扰饶", "re:热惹",
    "ren:人任认忍仁韧刃纫", "reng:仍扔", "ri:日", "rong:容荣融溶绒熔蓉",
    "rou:肉柔揉", "ru:如入汝儒乳辱", "ruan:软阮", "rui:瑞锐", "run:润闰",
    "ruo:若弱",
    "sa:撒萨洒", "sai:赛塞腮", "san:三散伞", "sang:桑丧嗓", "sao:扫嫂骚",
    "se:色瑟涩", "sen:森", "sha:杀沙啥傻纱厦煞", "shai:晒筛",
    "shan:山闪衫善扇删陕擅珊杉煽", "shang:上商伤尚赏裳",
    "shao:少绍烧稍勺哨邵捎梢", "she:社设舍射蛇涉摄舌赦",
    "shen:深身什神甚申伸审沈绅慎渗婶", "sheng:生声省胜升圣剩盛绳牲",
    "shi:是时十事实使世市式士师史示石食始施视识诗失室适试势释饰氏狮湿拾尸逝誓侍蚀驶匙",
    "shou:手受收首售授守瘦寿兽",
    "shu:书数术属树输束述熟殊舒叔鼠署薯淑梳蔬疏枢暑", "shua:刷耍",
    "shuai:摔甩率帅衰", "shuan:拴栓", "shuang:双爽霜", "shui:水谁睡税",
    "shun:顺瞬", "shuo:说硕烁",
    "si:四死思斯司似私丝寺撕肆饲伺祀", "song:送松宋颂诵耸", "sou:搜艘嗽",
    "su:素速苏诉宿俗塑肃粟溯", "suan:算酸蒜", "sui:岁随虽碎遂隋穗髓",
    "sun:孙损笋", "suo:所缩锁索唆梭",
    "ta:他她它塔踏塌", "tai:太台态抬泰胎苔", "tan:谈探坦叹炭摊贪滩瘫潭毯坛",
    "tang:堂糖汤唐躺趟塘倘烫", "tao:套讨逃桃涛掏萄淘陶", "te:特",
    "teng:疼腾藤", "ti:体提题替踢梯蹄剃涕惕屉", "tian:天田填甜添",
    "tiao:条跳挑", "tie:铁贴帖", "ting:听停厅挺庭亭艇廷",
    "tong:同通统痛童桶铜筒捅", "tou:头投透偷", "tu:土图突徒途涂屠兔吐",
    "tuan:团", "tui:推退腿褪", "tun:吞屯", "tuo:脱拖托妥拓驼椭",
    "wa:挖瓦娃哇袜蛙", "wai:外歪", "wan:万完晚湾玩碗弯挽顽腕婉",
    "wang:王望往网忘亡汪旺妄",
    "wei:为位未围卫委维味伟微危威胃唯谓尾慰伪魏惟纬违",
    "wen:文问闻温稳吻纹蚊", "weng:翁嗡", "wo:我握窝卧沃蜗",
    "wu:五无物务武午舞屋污误悟吴乌雾勿伍捂诬",
    "xi:西系息希习洗细戏吸喜析席袭惜稀溪锡牺膝嘻熄媳悉",
    "xia:下夏吓虾峡狭霞辖",
    "xian:现先线县显险限闲献鲜嫌衔贤弦咸掀仙纤",
    "xiang:想向相象响香乡项享箱详祥巷厢镶橡翔",
    "xiao:小笑消效校销晓孝肖削宵萧啸",
    "xie:写些谢协鞋斜携泄卸屑蟹邪歇蝎", "xin:新心信辛欣薪芯锌",
    "xing:行性型形星兴刑醒幸姓腥", "xiong:雄兄胸凶熊",
    "xiu:修秀休袖绣羞嗅锈", "xu:需许续须序虚吁绪叙徐旭絮墟",
    "xuan:选宣悬旋玄轩喧", "xue:学血雪穴靴", "xun:寻训迅讯巡询循旬逊熏",
    "ya:亚压呀牙雅哑鸭押芽崖涯",
    "yan:眼言严演研烟沿盐炎颜延岩宴艳验厌掩燕淹咽焰阎",
    "yang:样养羊阳洋杨扬仰氧痒央秧殃", "yao:要药摇遥咬腰邀妖耀窑谣",
    "ye:也业夜叶野爷液冶页椰",
    "yi:一以意已义议易衣医依移异益亿艺遗忆宜椅伊仪谊译疑乙翼逸蚁毅颐役疫",
    "yin:因引银音印隐饮阴姻吟尹",
    "ying:应英影营迎硬赢映盈颖鹰婴莹萤", "yo:哟",
    "yong:用永拥勇涌泳庸佣踊",
    "you:有又由右油游友优幼尤忧邮悠诱幽犹釉",
    "yu:于与鱼雨语育余遇预玉愚誉域欲狱喻郁愈浴羽渔娱淤禹宇寓裕豫",
    "yuan:元员原远院园愿源圆缘袁怨渊苑援", "yue:月越约阅跃悦岳粤",
    "yun:运云允匀韵晕孕酝",
    "za:杂砸咋", "zai:在再载灾栽宰", "zan:咱赞暂攒", "zang:脏葬",
    "zao:早造遭糟灶燥躁枣凿澡", "ze:则责泽择", "zei:贼", "zen:怎",
    "zeng:增赠憎", "zha:炸扎眨渣闸榨", "zhai:摘宅窄债斋",
    "zhan:站战展占沾斩辗崭盏蘸",
    "zhang:张章掌涨帐障账胀仗杖丈彰", "zhao:找照招召赵兆罩昭沼",
    "zhe:这着者折哲遮辙浙", "zhen:真阵镇针震振珍枕诊斟侦贞",
    "zheng:正政争整证征挣郑蒸睁狰筝怔",
    "zhi:之只知至指直制治质值职致织支纸止址志执智置植殖脂芝汁肢秩旨滞挚掷帜稚窒蜘",
    "zhong:中种重众终钟忠衷肿仲", "zhou:周州洲舟粥皱宙昼骤轴肘咒",
    "zhu:主住注助著逐诸朱猪竹烛筑驻柱铸珠煮嘱蛛瞩拄贮", "zhua:抓爪",
    "zhuai:拽", "zhuan:转专砖赚", "zhuang:装状壮庄撞桩妆",
    "zhui:追坠缀锥", "zhun:准", "zhuo:桌捉卓浊灼茁琢啄",
    "zi:子自字资姿紫滋仔咨籽梓滓", "zong:总宗纵踪棕综", "zou:走奏邹揍",
    "zu:组族足祖租阻卒诅", "zuan:钻", "zui:最嘴罪醉", "zun:尊遵",
    "zuo:做作坐左座昨佐")

  // --- Round-8 extension tier: next-frequency-band hanzi --------------
  // Same grouped `pinyin:characters` format, same duplicate guard (the
  // builder rejects any character that appears under two syllables
  // across BOTH tiers). Most-common reading wins for polyphones, as in
  // tier 1. Coverage after this tier: ~6415 characters; what is
  // STILL outside the table drops from merge keys, observably — the
  // pipeline counts those via the cjk_unmapped stat (round 8).
  private val pinyinGroups2 = Seq(
    "a:锕吖嗄", "ai:嗳嫒瑷暧隘蔼霭皑捱噫砹锿", "an:鞍氨庵桉谙鹌埯铵揞犴", "ang:肮盎卬",
    "ao:鳌袄坳拗嗷岙廒遨媪骜聱螯鏊鏖", "ba:笆疤粑岜灞钯耙鲅魃菝跋茇捌叭", "bai:掰佰呗捭稗",
    "ban:斑瘢癍舨坂阪绊钣瓣扳", "bang:蚌谤镑磅浜梆髈蒡", "bao:豹鲍雹苞褒孢勃刨煲鸨褓趵龅",
    "bei:悖钡狈惫邶鐾鹎碚褙鞴孛陂", "ben:苯畚坌锛贲", "beng:蹦迸甭泵嘣甏堋",
    "bi:匕妣庇陛毙狴铋婢筚箅篦薜襞跸髀弼愎滗濞璧哔荸匾毖", "bian:砭笾碥褊蝙鳊弁汴缏辫忭缡扁",
    "biao:婊飑飙飚镖镳瘭裱鳔骠杓膘", "bie:憋瘪蹩鳖", "bin:彬斌濒殡膑镔髌豳缤槟傧玢", "bing:柄秉禀邴摒冫",
    "bo:亳啵钵饽檗擘礴钹鹁簸跛踣箔膊", "bu:埠簿哺怖埔瓿逋晡钸钚醭", "ca:嚓礤", "cai:睬", "can:璨孱骖粲",
    "cang:伧", "cao:糙嘈漕螬艚", "ce:恻", "cen:岑涔", "ceng:噌蹭", "cha:衩汊姹杈楂槎檫镲锸猹馇诧",
    "chai:钗豺侪虿瘥", "chan:蝉馋谗阐忏婵骣觇禅潺蟾廛镡冁躔蒇囅", "chang:倡猖鲳阊菖惝徜怅氅鬯娼嫦",
    "chao:钞巢剿晁焯耖怊", "che:澈坼砗掣唓", "chen:忱谶碜抻谌宸琛榇龀", "cheng:澄橙骋铖裎埕枨塍铛瞠柽蛏",
    "chi:墀哧啻嗤弛齿侈炽鸱螭篪魑叱饬媸豉褫彳坻茌", "chong:宠忡憧舂茺铳", "chou:俦帱惆瞅稠畴踌雠",
    "chu:矗搐憷绌黜楮杵橱锄雏滁躇蹰褚亍刍怵", "chua:欻", "chuai:踹搋嘬膪", "chuan:舛遄氚钏镩舡",
    "chuang:疮怆", "chui:捶椎槌棰陲", "chun:醇淳鹑莼肫蝽", "chuo:戳绰辍踔龊啜",
    "ci:祠茨瓷赐疵鹚糍呲粢", "cong:琮淙枞骢苁璁", "cou:凑辏腠楱", "cu:簇猝蹴蹙殂徂", "cuan:篡窜蹿撺爨汆",
    "cui:萃悴淬瘁粹璀榱毳", "cun:皴", "cuo:磋撮蹉锉厝挫嵯痤矬鹾脞", "da:耷哒嗒沓怛靼鞑笪瘩疸褡",
    "dai:歹怠殆黛甙岱迨骀绐玳", "dan:丹郸惮掸氮啖澹殚赕眈瘅箪儋耽聃", "dang:裆宕菪凼砀谠", "dao:叨捣悼忉氘纛",
    "de:锝", "deng:蹬嶝磴镫簦戥", "di:堤镝嘀涤翟嫡氐籴诋谛狄棣睇娣荻碲羝骶邸柢", "dia:嗲",
    "dian:滇巅坫惦奠玷癜簟踮靛碘佃甸钿阽扂", "diao:凋貂碉鲷叼铫铞扚", "die:谍堞瓞揲喋渫牒蹀耋鲽迭",
    "ding:玎耵酊仃啶碇腚疔叮鼎", "diu:铥", "dong:侗垌峒氡鸫岽咚恫", "dou:蔸篼窦痘",
    "du:嘟渎椟牍犊黩髑镀蠹笃督妒芏", "duan:缎煅簖椴", "dui:碓憝镦怼", "dun:墩敦钝遁囤沌盹礅趸",
    "duo:掇哆踱跺剁惰咄哚缍沲柁铎裰", "e:屙诶谔垩阏讹娥峨扼遏噩愕鳄颚鄂锇鹗萼遌腭砐", "en:摁蒽嗯", "er:贰迩珥铒鸸鲕佴",
    "fa:砝垡筏珐", "fan:藩樊矾钒蕃幡犿燔畈蘩氾璠", "fang:肪坊钫舫彷", "fei:绯蜚腓痱芾淝悱狒镄霏翡榧鲱萉",
    "fen:吩芬氛汾忿粪酚偾瀵鲼棻", "feng:葑沣砜俸唪酆", "fou:缶",
    "fu:孵俘郛莩甫腑滏蜉黼馥蚨跗鲋鳆幞怫艴苻茯砩呋凫釜脯咐蝠辐袱弗拂傅阜讣缚驸绂绋黻罘稃蝮", "ga:噶嘎尕尜旮钆伽",
    "gai:垓陔赅丐溉戤", "gan:苷泔矸疳酐澉绀橄擀旰", "gang:杠冈肛戆罡筻釭", "gao:皋羔篙镐睾诰郜锆槔缟",
    "ge:戈疙蛤骼镉膈嗝纥袼仡圪塥漯鬲", "gen:茛哏亘艮", "geng:埂庚羹哽赓鲠绠", "gong:龚珙蚣觥肱廾",
    "gou:佝诟岣遘媾缑枸鞲觏篝垢", "gu:咕箍沽汩鹘诂毂鹄臌瞽罟钴锢鸪梏牯祜", "gua:呱剐诖褂栝胍鸹",
    "guan:倌棺鳏盥掼涫莞", "guang:咣犷桄胱", "gui:瑰圭闺硅匦庋宄刿刽桧炅晷簋鲑鳜妫", "gun:辊磙鲧绲衮",
    "guo:涡聒蝈虢馘椁帼崞猓埚蜾", "ha:铪", "hai:骸氦嗨胲醢", "han:酣憨邯涵函翰撼悍邗菡撖阚瀚晗焓颔蚶鼾",
    "hang:夯沆绗颃", "hao:蒿薅嚎壕郝皓嚆濠灏昊颢蚝", "he:诃菏貉阂涸鹤嗬阖曷盍颌劾壑藿嗑鞨", "heng:亨蘅珩桁",
    "hong:烘弘黉讧荭蕻薨闳泓", "hou:犼逅糇骺堠鲎篌", "hu:乎瑚葫唬沪冱唿囫岵猢怙惚浒滹琥槲觳烀煳戽扈鹕鹱笏醐斛",
    "hua:哗骅桦劃铧", "huai:槐踝", "huan:桓痪豢郇奂垸洹萑圜獾浣漶寰逭缳锾鲩鬟",
    "huang:磺蝗簧惶幌恍隍徨湟潢遑璜肓癀蟥篁鳇", "hui:徽蛔卉秽烩讳诲诙茴荟蕙哕喙隳洄彗缋珲晖恚虺蟪麾", "hun:诨馄阍溷",
    "huo:攉嚯夥钬锪镬耠蠖劐嚄咟",
    "ji:唧叽讥鸡姬缉棘疾汲嫉蓟伎寂继藉亟乩剞佶偈诘墼芨蒺蕺掎咭哜岌嵴洎屐骥畿玑楫殛戟戢赍笈笄暨跻跽霁鲚鲫髻麂",
    "jia:枷荚贾钾郏拮岬浃迦珈戛胛恝铗镓痂蛱笳袈跏", "jian:尖笺煎缄茧硷俭剪槛鉴践健饯溅涧僭谏谫菅笕戋戬牮犍毽腱睑锏鹣裥踺搛缣鲣鞯",
    "jiang:桨茳洚绛缰犟礓耩糨豇", "jiao:蕉礁铰矫侥酵轿窖佼僬艽茭挢噍峤徼姣敫皎鹪蛟醮跤鲛",
    "jie:揭秸阶茎睫芥疥诫讦喈嗟獬婕孑桀碣疖袷颉蚧羯鲒骱", "jin:巾襟谨靳烬浸卺荩堇噤馑廑妗缙瑾槿赆觐钅矜衿",
    "jing:劲荆鲸粳痉靖竟刭儆阱菁獍憬泾迳弪婧肼胫腈旌", "jiong:炯迥扃駉", "jiu:玖韭厩臼咎疚僦啾阄柩桕鹫赳鬏",
    "ju:狙疽咀沮踞炬倨讵苣苴莒掬遽屦琚椐榘榉橘犋飓钜锔窭裾趄醵踽龃雎鞫", "juan:鹃眷鄄狷涓桊蠲锩镌隽",
    "jue:撅攫抉倔诀厥劂谲矍蕨噘崛獗孓珏桷橛爝镢蹶觖", "jun:浚郡筠麇皲钧", "ka:咔喀咯佧胩",
    "kai:揩楷剀垲蒈忾恺铠锎锴", "kan:勘侃凵莰莶戡龛瞰", "kang:糠亢伉闶钪", "kao:尻栲犒铐",
    "ke:坷磕岢恪溘骒缂珂轲氪瞌钶疴窠颏蚵髁稞", "ken:裉", "keng:吭铿", "kong:倥崆箜", "kou:抠芤蔻叩眍筘",
    "ku:刳堀喾绔骷", "kua:胯侉", "kuai:侩蒯郐哙狯脍", "kuan:髋", "kuang:匡诓诳邝圹夼哐纩贶",
    "kui:盔岿葵魁傀溃馗匮夔隗揆喹喟愦阕逵暌睽聩蝰篑跬悝", "kun:坤悃阃琨锟醌鲲髡", "kuo:蛞", "la:垃剌摺邋旯砬瘌",
    "lai:崃徕涞濑赉睐铼癞籁", "lan:婪阑兰澜谰岚漤榄斓罱镧褴", "lang:琅榔莨蒗啷阆稂螂锒",
    "lao:佬酪涝唠崂栳铑铹痨醪耢", "le:肋仂叻嘞泐鳓", "lei:镭儡擂羸诔嫘缧檑耒酹", "leng:棱楞塄薐",
    "li:梨犁篱狸漓鲤荔傈俐痢粒隶哩俪俚郦坜苈莅蓠藜捩呖唳喱猁溧澧逦娌嫠骊枥栎轹戾砺詈罹锂鹂疠疬蜊蠡笠篥粝醴跞雳鲡鳢黧",
    "lian:敛链蠊濂臁裢裣蔹奁潋琏殓", "liang:粱墚椋踉靓魉", "liao:燎寥潦撂镣蓼尥嘹獠寮缭钌鹩",
    "lie:冽埒咧洌趔躐鬣", "lin:琳霖吝拎蔺啉嶙廪遴檩辚瞵粼躏麟", "ling:菱伶羚酃苓呤囹泠绫柃棂瓴聆蛉翎鲮",
    "liu:琉馏抡偻蒌喽嵝镂瘘耧蝼髅浏遛骝绺镏鹨", "long:咙窿陇垅茏泷珑栊胧砻癃", "lou:娄",
    "lu:掳卤虏麓潞戮垆摅撸噜泸渌漉璐栌橹轳辂辘氇胪镥鸬鹭簏舻鲈", "luan:峦挛孪滦脔娈栾鸾銮", "lue:掠略锊",
    "lun:纶囵", "luo:锣箩骡倮蠃荦摞猡泺椤脶镙瘰雒", "lv:吕缕氯捋闾榈膂稆褛", "ma:蚂唛犸嬷杩麽", "mai:劢荬霾",
    "man:曼谩墁幔缦熳镘颟螨鳗鞔", "mang:芒邙漭朦硭蟒", "mao:茅铆卯袤冇瑁耄峁瞀蝥蟊髦懋昴牦",
    "mei:镁昧寐媚莓嵋猸浼湄楣镅鹛袂", "men:扪焖懑钔", "meng:檬锰勐甍瞢懵礞虻蜢蠓艋艨",
    "mi:醚靡糜泌幂芈冖谧蘼嘧猕汨宓弭脒敉縻麋", "mian:冕沔渑湎腼眄黾娩", "miao:藐渺喵邈缈缪杪淼眇鹋",
    "mie:咩蠛篾乜", "min:抿皿苠岷闵泯珉愍玟缗", "ming:螟冥茗溟暝瞑酩", "mo:摹蘑沫寞谟茉蓦馍嫫镆秣瘼耱貊貘殁",
    "mou:侔哞眸蛑鍪", "mu:拇牡暮睦仫苜呒沐坶毪钼", "na:呐捺肭镎衲箬", "nai:氖鼐萘柰", "nan:囡楠腩蝻赧",
    "nang:攮囔馕曩", "nao:淖孬垴呶猱瑙硇铙蛲", "ne:讷", "nen:恁", "ni:霓倪匿伲坭猊怩滠昵旎祢慝铌鲵",
    "nian:蔫拈廿辇黏鲇鲶", "niao:茑嬲脲袅", "nie:啮镊镍涅陧蘖嗫颞臬蹑", "ning:狞泞佞蓥咛甯聍",
    "niu:狃忸妞", "nong:脓侬哝", "nu:帑弩胬孥驽", "nue:虐疟谑", "nuo:糯傩搦喏锘", "nv:女恧钕衄",
    "o:噢喔", "ou:藕沤怄瓯耦讴", "pa:啪琶葩筢杷", "pai:湃俳蒎哌", "pan:潘磐爿泮袢襻蟠蹒",
    "pang:耪滂逄", "pao:咆匏狍庖脬疱", "pei:呸胚沛掊辔帔淠旆锫醅霈", "pen:湓",
    "peng:砰抨澎彭硼篷坯嘭怦蟛", "pi:砒霹琵毗痞丕陴邳郫圮鼙擗噼庀媲纰枇甓睥罴铍癖疋蚍貔", "pian:谝骈胼蹁犏",
    "piao:剽嘌嫖缥殍瞟螵", "pie:丿苤氕", "pin:拚姘嫔榀牝颦", "ping:坪苹俜娉枰鲆", "po:粕叵鄱溥珀钋钷皤笸",
    "pou:裒", "pu:莆菩圃浦匍噗濮璞氆镤镨蹼",
    "qi:栖凄柒沏畦崎脐祁乞砌迄泣讫亓俟圻芑萋葺嘁屺岐汔淇骐绮琪琦杞桤槭欹祺憩碛蛴蜞綦綮蹊鳍麒", "qia:葜髂",
    "qian:扦钎仟黔钳遣堑歉佥阡芊芡荨掮岍悭慊骞搴褰缱椠肷愆钤虔箝倩", "qiang:呛羌蔷嫱樯戗炝锖锵镪襁蜣羟跫跄",
    "qiao:橇锹鞘撬峭劁诮谯荞愀憔缲樵硗跷鞒", "qie:茄郄唼惬妾挈锲箧", "qin:钦芹沁芩蓁蕲揿吣嗪噙溱檎螓衾",
    "qing:擎氰苘圊檠磬蜻罄箐謦鲭黥", "qiong:邛茕穹筇銎", "qiu:酋泅俅巯犰湫逑遒楸赇鸠虬蚯蝤裘糗鳅鼽",
    "qu:蛆龋诎劬蕖蘧岖衢阒璩觑氍祛磲癯蛐麴瞿黢朐", "quan:颧醛痊诠荃悛绻辁畎铨蜷筌鬈", "que:瘸榷阙悫炔", "qun:逡",
    "ran:苒髯蚺", "rang:瓤攘禳穰", "rao:荛娆桡", "ren:壬妊仞荏葚饪轫稔衽", "rong:戎茸冗嵘狨缛榕蝾",
    "rou:糅蹂鞣", "ru:茹蠕孺褥蓐薷嚅洳溽濡铷襦颥", "ruan:朊", "rui:蕊芮蕤睿蚋", "ruo:偌蒻",
    "sa:卅仨挲飒", "sai:鳃噻", "san:叁馓毵糁", "sang:搡磉颡", "sao:搔埽臊瘙鳋", "se:啬铩濇缫",
    "seng:僧", "sha:莎砂刹脎歃痧裟霎鲨", "shai:酾", "shan:苫赡膳汕缮剡讪鄯埏芟潸姗膻钐疝蟮舢跚鳝彡",
    "shang:墒晌垧绱殇熵觞", "shao:芍韶劭苕潲蛸笤筲艄", "she:奢赊慑厍佘猞畲麝", "shen:砷呻娠肾诜谂莘渖椹哂矧蜃",
    "sheng:甥丞媵眚笙", "shi:虱矢屎柿拭嗜噬仕恃谥埘莳蓍弑饣轼耆贳炻礻铈铊螫舐筮豕鲥鲺", "shou:扌狩绶艏",
    "shu:抒赎孰曙蜀黍戍竖墅庶漱恕倏塾菽沭涑澍姝纾毹腧殳秫", "shua:唰", "shuai:蟀", "shuan:闩涮",
    "shuang:孀", "shui:氵", "shun:吮舜", "shuo:朔蒴搠嗍濯妁槊铄",
    "si:嘶嗣巳厮兕菥咝汜泗澌姒驷缌锶鸶耜蛳笥", "song:怂讼凇菘崧嵩忪悚淞竦", "sou:擞叟嗖嗾馊溲飕瞍锼螋",
    "su:酥僳夙谡蔌嗉愫簌觫稣", "suan:狻", "sui:绥隧祟蓑谇濉邃燧眭睢", "sun:荪榫隼狲飧",
    "suo:琐唢嗦娑桫睃羧", "ta:獭挞蹋闼溻遢榻鳎趿", "tai:酞汰邰薹肽炱钛跆鲐", "tan:坍檀痰谭袒碳郯蕈昙忐钽锬",
    "tang:搪棠膛淌傥饧溏瑭铴镗耥螗螳羰醣", "tao:滔绦鼗啕韬饕", "te:忑忒铽", "teng:誊滕",
    "ti:剔锑啼嚏荑悌逖绨缇鹈醍", "tian:恬舔腆掭忝阗殄畋", "tiao:迢眺佻祧窕蜩粜龆鲦髫", "tie:萜餮",
    "ting:烃汀莛葶婷梃蜓霆", "tong:桐酮瞳彤佟僮仝茼嗵恸潼砼", "tou:亠骰", "tu:凸秃堍荼菟钍酴",
    "tuan:湍疃抟彖", "tui:颓蜕煺", "tun:臀饨暾豚窀氽", "tuo:鸵陀驮唾乇佗坨庹沱柝砣箨跎鼍", "wa:洼佤娲腽",
    "wai:崴", "wan:豌丸烷皖惋宛剜芄苋菀纨绾琬脘畹蜿箢", "wang:枉罔尢惘辋魍",
    "wei:巍韦桅潍苇萎蔚畏喂渭尉倭偎诿隈葳薇帏帷嵬猥猬闱沩洧涠逶娓玮韪軎炜煨痿艉鲔", "wen:瘟紊刎愠阌汶璺韫雯",
    "weng:瓮蓊蕹", "wo:挝斡莴幄渥杌肟龌", "wu:巫呜钨芜梧吾毋侮坞戊晤兀仵阢邬圬芴庑怃忤浯寤迕妩骛牾焐鹉鹜蜈鋈鼯",
    "xi:昔熙硒矽晰夕烯汐犀檄铣隙僖兮隰郗茜葸蓰奚唏徙饩阋浠淅屣嬉玺樨曦觋欷熹禊禧皙穸蜥蟋舾羲粞翕醯鼷歙舄",
    "xia:瞎匣暇侠葭狎遐瑕硖瘕罅黠", "xian:锨舷涎腺馅羡宪陷冼藓岘猃暹娴氙祆鹇痫蚬筅跹酰霰",
    "xiang:襄湘像芗葙饷庠骧缃蟓鲞飨", "xiao:硝霄哮嚣淆哓咻崤潇逍骁绡枭枵筱箫魈",
    "xie:楔挟胁谐械懈泻偕亵勰燮薤撷廨瀣邂绁缬榭榍躞", "xin:忻衅囟馨歆鑫忄", "xing:猩惺邢杏陉荇荥擤悻硎",
    "xiong:匈汹芎", "xiu:朽莠岫馐庥鸺貅髹", "xu:戌嘘蓄酗恤婿诩圩蓿洫溆顼栩煦砉盱胥糈醑",
    "xuan:癣眩绚儇谖萱揎馔泫洵渲漩璇楦暄炫煊碹铉镟痃", "xue:薛噱泶鳕", "xun:勋驯殉汛巽埙荀薰峋徇浔曛窨醺鲟恂",
    "ya:鸦丫蚜衙讶伢揠岈迓娅琊桠氩砑睚痖",
    "yan:焉阉蜒奄衍堰砚雁唁彦谚厣靥赝俨偃兖讠谳郾鄢芫菸崦恹闫洇湮滟妍嫣琰晏胭腌焱罨筵酽魇餍鼹檐", "yang:鸯佯疡漾徉怏泱炀烊恙蛘鞅",
    "yao:瑶尧姚舀夭爻吆崾徭瀹幺珧杳曜肴鹞窈繇鳐", "ye:噎耶掖曳腋谒邺揶馀晔烨铘",
    "yi:壹揖铱夷胰沂姨彝倚矣抑邑屹臆肄亦裔溢诣翌绎刈劓佾诒圯埸懿苡薏弈奕挹弋呓咦咿峄嶷猗饴怿怡悒漪迤驿缢殪贻旖熠钇镒镱痍瘗癔翊衤蜴舣羿翳酏黟",
    "yin:茵荫殷淫寅胤鄞堙茚喑狺夤氤铟瘾蚓霪龈", "ying:樱缨荧蝇嬴郢茔莺萦撄嘤膺滢潆瀛瑛璎楹鹦瘿颍罂", "yo:唷",
    "yong:臃痈雍蛹咏恿俑壅墉慵邕镛甬鳙饔", "you:铀酉佑卣攸侑莸呦囿宥柚猷牖铕疣蝣鱿黝鼬蚴蚰",
    "yu:迂盂榆虞舆俞逾愉渝隅予屿芋峪御驭禺毓伛俣谀谕萸蓣揄喁圄圉嵛狳饫庾阈妪妤纡瑜昱觎腴欤於煜燠聿钰鹆瘐瘀窳蜮蝓竽舁雩龉臾鹬",
    "yuan:鸳冤垣辕猿塬沅媛瑗橼爰眢鸢螈鼋", "yue:曰钥龠钺刖", "yun:耘郧陨蕴郓芸狁恽纭殒昀氲熨", "za:匝咂",
    "zai:哉崽甾", "zan:瓒昝簪糌趱錾", "zang:赃奘驵臧", "zao:藻蚤噪皂唣", "ze:仄赜啧迮昃笮箦舴",
    "zen:谮", "zeng:缯甑罾锃", "zha:喳札轧铡栅乍诈揸吒咤哳砟痄蚱齄", "zhai:寨砦瘵",
    "zhan:瞻毡詹栈湛绽谵搌旃", "zhang:樟漳瘴仉鄣幛嶂獐嫜璋蟑", "zhao:肇诏棹钊笊", "zhe:蛰锗蔗谪柘辄磔鹧褶蜇赭",
    "zhen:甄砧臻疹缜桢榛轸赈胗朕祯畛鸩", "zheng:拯帧症诤峥钲铮",
    "zhi:枝吱侄趾峙炙痔卮陟郅埴芷摭帙忮彘咫骘栉枳栀桎轵轾贽膣祉祗黹雉鸷痣蛭絷酯跖踬踯豸觯", "zhong:盅冢锺螽舯踵",
    "zhou:诌帚啁妯纣绉伷胄碡籀酎", "zhu:株诛蛀祝伫侏邾苎茱洙渚潴驺杼槠橥炷铢疰瘃竺箸翥躅麈", "zhuan:撰篆啭颛",
    "zhui:赘骓缒隹", "zhun:谆", "zhuo:拙酌倬诼擢浞涿禚斫镯", "zi:兹淄孜渍谘嵫姊孳缁辎赀恣眦锱秭耔笫觜訾鲻髭",
    "zong:鬃腙粽", "zou:诹陬鄹鲰", "zu:俎菹镞", "zuan:纂攥缵躜", "zui:蕞", "zun:撙樽鳟",
    "zuo:柞胙祚酢唑怍")

  private val pinyin: Map[Char, String] = {
    val entries = (pinyinGroups ++ pinyinGroups2).flatMap { g =>
      val Array(py, chars) = g.split(":", 2)
      chars.map(_ -> (py + " "))
    }
    val dups = entries.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    require(dups.isEmpty,
      s"character listed under two syllables: ${dups.keys.mkString(",")}")
    entries.toMap
  }

  // --- Round-15 extension tier: ICU Han-Latin tail ---------------------
  // The ideograph surface BEYOND the two hand tiers (VERDICT r14 #7: the
  // reference's `unidecode` maps ~30k ideographs vs the hand tiers'
  // ~6.4k), derived at first use from ICU4J's Han-Latin transliterator —
  // CLDR/Unihan kMandarin readings, the same authority `unidecode`'s CJK
  // section descends from; icu4j ships on every Spark 4 classpath for
  // collation support, so this adds no dependency. Post-processed to the
  // table's convention: Latin-ASCII strips tones, lowercase, trailing
  // space. The HAND tiers keep priority — their polyphone choices follow
  // `unidecode`'s most-common-reading convention, which ICU's kMandarin
  // sometimes disagrees with (地 di vs de, 长 chang vs zhang) — so every
  // previously-mapped character folds exactly as before. Coverage gain
  // (ICU 77.1): basic block 20,924/20,992 readable, ext A 5,787/6,592;
  // what ICU can't read stays unmapped and observable via cjk_unmapped.
  // One-time ~0.4 s derivation per JVM, paid lazily on the first fold
  // of an ideograph outside the hand tiers; lock-free reads afterwards.
  private lazy val icuHan: Map[Char, String] = {
    val t = com.ibm.icu.text.Transliterator
      .getInstance("Han-Latin; Latin-ASCII; Lower")
    ((0x3400 to 0x4DBF) ++ (0x4E00 to 0x9FFF)).flatMap { cp =>
      val s = cp.toChar.toString
      val out = t.transliterate(s)
      // accept only clean single-syllable readings (pure lowercase ASCII
      // letters); anything else stays unmapped, like the hand tiers
      if (out != s && out.nonEmpty && out.forall(c => c >= 'a' && c <= 'z'))
        Some(cp.toChar -> (out + " "))
      else None
    }.toMap
  }

  /** Transliterate one CJK-range character, or None if outside every
    * covered block (the caller drops it, `unidecode`-style). */
  def fold(ch: Char): Option[String] = {
    if (ch >= 0xAC00 && ch <= 0xD7A3) Some(hangul(ch))
    // Conjoining jamo (what NFD decomposes a syllable into, and how
    // decomposed Korean text arrives): same three transliteration tables.
    else if (ch >= 0x1100 && ch <= 0x1112) Some(choseong(ch - 0x1100))
    else if (ch >= 0x1161 && ch <= 0x1175) Some(jungseong(ch - 0x1161))
    else if (ch >= 0x11A8 && ch <= 0x11C2) Some(jongseong(ch - 0x11A8 + 1))
    else if (ch >= 0xFF01 && ch <= 0xFF5E) Some(((ch - 0xFEE0).toChar).toString)
    else if (ch == 0x3000) Some(" ")
    // ideograph blocks: hand tiers first (unidecode-convention polyphone
    // choices), then the ICU Han-Latin tail; the range guard keeps the
    // lazy ICU derivation from firing for non-ideograph misses
    else if ((ch >= 0x4E00 && ch <= 0x9FFF) || (ch >= 0x3400 && ch <= 0x4DBF))
      pinyin.get(ch).orElse(icuHan.get(ch))
    else kana.get(ch).orElse(punct.get(ch)).orElse(pinyin.get(ch))
  }

  /** Table sizes, exposed for the coverage spec. */
  private[functions] def pinyinSize: Int = pinyin.size
  private[functions] def icuHanSize: Int = icuHan.size
}
